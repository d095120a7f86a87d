"""Pallas NMS suppression kernel: parity vs the XLA sweep path
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import caesar_yolo_tpu.detect.pallas_nms as pk
from caesar_yolo_tpu.detect import nms as nms_mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)


def _random_candidates(rng, b, k, spread=100.0):
    """Score-descending candidate boxes the way _select_candidates
    hands them to the suppression stage: [B, K, 4] xyxy + valid."""
    cx = rng.random((b, k)) * spread
    cy = rng.random((b, k)) * spread
    w = rng.random((b, k)) * 30 + 2
    h = rng.random((b, k)) * 30 + 2
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1).astype(np.float32)
    valid = rng.random((b, k)) > 0.1
    # score-descending order means trailing invalids; keep a few holes
    # too (class-offset path can interleave) — the kernel must honor
    # arbitrary valid masks exactly like the XLA path.
    valid[:, -3:] = False
    return jnp.asarray(boxes), jnp.asarray(valid)


@pytest.mark.parametrize("iou_thr", [0.3, 0.5, 0.7])
def test_kernel_matches_xla_sweep(rng, iou_thr):
    boxes, valid = _random_candidates(rng, b=4, k=64, spread=60.0)
    ref = jax.vmap(lambda nb, tv: nms_mod._suppress_xla(nb, tv, iou_thr))(
        boxes, valid)
    got = pk.nms_suppress(jnp.transpose(boxes, (0, 2, 1)), valid, iou_thr)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_kernel_crowded_scene(rng):
    """Dense overlaps force multi-sweep fixpoints (chained suppression
    where a killed box un-kills its own victims)."""
    boxes, valid = _random_candidates(rng, b=2, k=128, spread=25.0)
    ref = jax.vmap(lambda nb, tv: nms_mod._suppress_xla(nb, tv, 0.5))(
        boxes, valid)
    got = pk.nms_suppress(jnp.transpose(boxes, (0, 2, 1)), valid, 0.5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # sanity: suppression actually happened and survivors exist
    kept = np.asarray(got).sum()
    assert 0 < kept < np.asarray(valid).sum()


def test_kernel_all_invalid():
    boxes = jnp.zeros((1, 8, 4), jnp.float32)
    valid = jnp.zeros((1, 8), bool)
    got = pk.nms_suppress(jnp.transpose(boxes, (0, 2, 1)), valid, 0.5)
    assert not np.asarray(got).any()


def test_identical_boxes_keep_first():
    """N identical boxes: only the highest-scoring (row 0) survives —
    the strict rank ordering (row_ids < col_ids) must match XLA."""
    box = jnp.asarray([[10.0, 10.0, 40.0, 40.0]])
    boxes = jnp.tile(box, (6, 1))[None]          # [1, 6, 4]
    valid = jnp.ones((1, 6), bool)
    got = np.asarray(pk.nms_suppress(
        jnp.transpose(boxes, (0, 2, 1)), valid, 0.5))
    assert got.tolist() == [[True] + [False] * 5]


@pytest.mark.parametrize("k", [189, 300])
def test_kernel_unaligned_k_padding(rng, k):
    """K not a multiple of the 128-lane tile (small img_size or custom
    --pre_nms) must pad internally and still match the XLA sweep."""
    boxes, valid = _random_candidates(rng, b=2, k=k, spread=50.0)
    ref = jax.vmap(lambda nb, tv: nms_mod._suppress_xla(nb, tv, 0.5))(
        boxes, valid)
    got = pk.nms_suppress(jnp.transpose(boxes, (0, 2, 1)), valid, 0.5)
    assert got.shape == (2, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_portable_suppression_forces_xla(rng, monkeypatch):
    """deploy's portable_suppression must keep the Mosaic kernel out of
    traces even when the backend reports tpu (export portability)."""
    import sys

    boxes, valid = _random_candidates(rng, b=1, k=32)
    ref = jax.vmap(lambda nb, tv: nms_mod._suppress_xla(nb, tv, 0.5))(
        boxes, valid)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # make any attempt to import the pallas kernel explode
    monkeypatch.setitem(sys.modules, "caesar_yolo_tpu.detect.pallas_nms",
                        None)
    with nms_mod.portable_suppression():
        got = nms_mod._suppress_batch(boxes, valid, 0.5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    from caesar_yolo_tpu.utils import portable
    assert not portable.FORCE  # restored on exit


def test_suppression_choice_is_jit_cache_keyed(rng, monkeypatch):
    """The Pallas-vs-XLA suppression choice must be a STATIC argument of
    the jitted NMS implementation, not a flag read inside the trace: a
    first nms_batch call on one backend must not pin later calls (e.g.
    a jax.export under portable_suppression, or the reverse ordering)
    to the first-seen branch via the jit trace cache."""
    a, nc = 64, 3
    boxes = jnp.asarray(rng.random((1, a, 4)) * 50, jnp.float32)
    boxes = boxes.at[..., 2:].add(60.0)  # x2>x1, y2>y1
    scores = jnp.asarray(rng.random((1, a, nc)), jnp.float32)

    # 1st call: CPU backend -> XLA path traced and cached
    ref = nms_mod.nms_batch(boxes, scores)

    # 2nd call, same shapes, backend now reports tpu: the resolver must
    # produce a DIFFERENT cache key and reach the pallas entry point
    called = []

    def fake_suppress(boxes_t, valid, thr):
        called.append(True)
        nb = jnp.transpose(boxes_t, (0, 2, 1))
        return jax.vmap(lambda b, v: nms_mod._suppress_xla(b, v, thr))(
            nb, valid)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pk, "nms_suppress", fake_suppress)
    got = nms_mod.nms_batch(boxes, scores)
    assert called, ("stale jit cache: the TPU-backend call never reached "
                    "the pallas suppression entry point")
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_use_pallas_resolver_knows_axon(monkeypatch):
    """'axon' is this repo's TPU backend name on the tunneled chip; the
    dispatch gate must treat it like 'tpu' (the sibling kernels'
    gates already do) or the VMEM-resident kernel is dead code there."""
    from caesar_yolo_tpu.utils import portable
    for name in ("tpu", "axon"):
        monkeypatch.setattr(jax, "default_backend", lambda n=name: n)
        assert nms_mod._use_pallas_suppression()
        with nms_mod.portable_suppression():
            assert not nms_mod._use_pallas_suppression()
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not nms_mod._use_pallas_suppression()
