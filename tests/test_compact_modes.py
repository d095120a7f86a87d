"""Parity of the three NMS compact-stage formulations (CY_COMPACT):
scatter4 (original), scatter1 (packed single scatter), argsort — all
must be bit-identical, including dead-row zeroing and the overflow
(> max_det survivors) discard rule.  See scripts/probe_compact_r5.py
for the on-chip cost measurements that motivated the variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.detect import nms as nms_mod


def _run(mode, b, c, k, a, max_det):
    prev = nms_mod._COMPACT_MODE
    nms_mod.set_compact_mode(mode)
    try:
        return jax.jit(
            lambda *t: jax.vmap(
                lambda *u: nms_mod._compact(*u, max_det))(*t))(b, c, k, a)
    finally:
        nms_mod._COMPACT_MODE = prev


def _mk(alive_fn, B=4, K=64, seed=0):
    rng = np.random.default_rng(seed)
    boxes = rng.uniform(0, 640, (B, K, 4)).astype(np.float32)
    conf = np.sort(rng.uniform(0.25, 1, (B, K)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    cls = rng.integers(0, 5, (B, K)).astype(np.int32)
    alive = alive_fn(rng, B, K)
    return boxes, conf, cls, alive


@pytest.mark.parametrize("mode", ["scatter1", "argsort"])
@pytest.mark.parametrize("pattern,max_det", [
    ("random", 32),          # typical
    ("all_dead", 32),        # no survivors
    ("all_alive", 32),       # overflow: K=64 survivors > max_det=32
    ("tail_only", 8),        # survivors clustered at the low-score end
])
def test_compact_mode_parity(mode, pattern, max_det):
    patterns = {
        "random": lambda rng, B, K: rng.random((B, K)) < 0.3,
        "all_dead": lambda rng, B, K: np.zeros((B, K), bool),
        "all_alive": lambda rng, B, K: np.ones((B, K), bool),
        "tail_only": lambda rng, B, K: np.tile(
            np.arange(K) >= K - 12, (B, 1)),
    }
    b, c, k, a = _mk(patterns[pattern])
    ref = _run("scatter4", b, c, k, a, max_det)
    got = _run(mode, b, c, k, a, max_det)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert np.array_equal(np.asarray(r), np.asarray(g)), \
            f"{mode}/{pattern} output {i} differs"


def test_compact_mode_through_nms_batch():
    """Full nms_batch parity with the mode switched (fresh trace per
    mode: the mode is read at trace time)."""
    rng = np.random.default_rng(3)
    boxes = rng.uniform(0, 640, (2, 400, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (2, 400, 2))
    scores = rng.uniform(0, 1, (2, 400, 5)).astype(np.float32)

    def run():
        out = nms_mod._nms_batch_impl(
            jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.5, 100,
            256, False, False)
        return [np.asarray(x) for x in out]

    prev = nms_mod._COMPACT_MODE
    try:
        nms_mod.set_compact_mode("scatter4")
        ref = run()
        for mode in ("scatter1", "argsort"):
            nms_mod.set_compact_mode(mode)
            # clear the jit cache so the new mode is actually traced
            nms_mod._nms_batch_impl.clear_cache()
            got = run()
            for i, (r, g) in enumerate(zip(ref, got)):
                assert np.array_equal(r, g), f"{mode} output {i}"
    finally:
        nms_mod._COMPACT_MODE = prev
        nms_mod._nms_batch_impl.clear_cache()
