"""Pallas hist-eq kernels: parity + lowering regression.

The 256-bin histogram equalization (reference preprocessing.py:977-1072)
is the one transform whose naive lowerings break the TPU backend
(round-2: jnp.interp's searchsorted HUNG the chip; round-3 measured the
scatter fix not finishing at 640 px and the XLA one-hot reduce 100x off
peak).  These tests pin (a) numeric parity of the Pallas batch path
against the reference-formula implementation, (b) that no
sort/searchsorted/scatter/gather primitive sneaks back into either
formulation's program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_yolo_tpu.ops.histeq import equalize_hist
from caesar_yolo_tpu.ops.pallas_histeq import equalize_hist_batch
from caesar_yolo_tpu.ops.transforms import (
    Pipeline,
    build_preprocessor,
    hist_equalizer,
)


def radio_batch(rng, b, h, w):
    x = rng.standard_normal((b, h, w)).astype(np.float32)
    for i in range(b):
        cy = int(rng.integers(10, h - 10))
        cx = int(rng.integers(10, w - 10))
        x[i, cy - 3:cy + 3, cx - 3:cx + 3] += 200.0
    x[:, :2, :2] = 0.0
    return x


@pytest.mark.parametrize("shape", [(2, 132, 132), (1, 64, 64),
                                   (3, 128, 256), (2, 96, 100)])
def test_equalize_hist_batch_parity(rng, shape):
    x = radio_batch(rng, *shape)
    ref = np.stack([np.asarray(equalize_hist(jnp.asarray(im))) for im in x])
    got = np.asarray(equalize_hist_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_hist_equalizer_stage_batch_matches_per_image(rng):
    x = radio_batch(rng, 3, 64, 64)[..., None]
    pipe = Pipeline([hist_equalizer()])
    out_b, ok_b = pipe.apply_batch(jnp.asarray(x))
    for i in range(x.shape[0]):
        out_i, _ = pipe(jnp.asarray(x[i]))
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_i),
                                   atol=2e-6)
    assert np.asarray(ok_b).all()


def test_chan3_batch_matches_per_image(rng):
    x = radio_batch(rng, 2, 64, 64)[..., None]
    pipe = build_preprocessor(chan3_preproc=True, normalize_minmax=True)
    out_b, ok_b = pipe.apply_batch(jnp.asarray(x))
    for i in range(x.shape[0]):
        out_i, ok_i = pipe(jnp.asarray(x[i]))
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_i),
                                   atol=2e-6)
        assert bool(ok_i) == bool(np.asarray(ok_b)[i])


FORBIDDEN = ("sort", "searchsorted", "scatter", "gather")


def _walk_eqns(jaxpr, seen):
    for eqn in jaxpr.eqns:
        seen.add(eqn.primitive.name)
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                _walk_eqns(inner, seen)
            if isinstance(v, (list, tuple)):
                for w in v:
                    inner = getattr(w, "jaxpr", None)
                    if inner is not None:
                        _walk_eqns(inner, seen)


def primitives_of(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    seen = set()
    _walk_eqns(jaxpr.jaxpr, seen)
    return seen


def test_histeq_lowering_has_no_sort_or_scatter():
    """Regression guard for the round-2 TPU hang (jnp.interp ->
    searchsorted -> sort) and the round-3 scatter pathology: neither
    formulation may contain sort/searchsorted/scatter/gather ops."""
    x2 = jnp.zeros((64, 64), jnp.float32)
    xb = jnp.zeros((2, 64, 64), jnp.float32)
    for fn, args in ((equalize_hist, (x2,)),
                     (equalize_hist_batch, (xb,))):
        prims = primitives_of(fn, *args)
        bad = {p for p in prims
               if any(f in p for f in FORBIDDEN) and p != "take"}
        # ops/histeq.equalize_hist still uses jnp.take (gather) — allowed
        # only in the per-image CPU path; the batch path must be clean
        if fn is equalize_hist_batch:
            assert not bad, f"forbidden primitives in batch path: {bad}"
        else:
            assert not {p for p in bad if "sort" in p}, (
                f"sort crept back into equalize_hist: {bad}")


def _sort_sizes(jaxpr, out):
    for eqn in jaxpr.eqns:
        if "sort" in eqn.primitive.name:
            out.extend(int(np.prod(v.aval.shape)) for v in eqn.invars
                       if v.aval.shape)
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                _sort_sizes(inner, out)
            if isinstance(v, (list, tuple)):
                for w in v:
                    inner = getattr(w, "jaxpr", None)
                    if inner is not None:
                        _sort_sizes(inner, out)


def test_chan3_batch_lowering_clean():
    """No scatter anywhere; the only sort allowed is zscale's
    1000-sample line fit (measured +0.27 ms/batch-128 on v5e) — never a
    full-image sort (the round-2 TPU-hang class)."""
    pipe = build_preprocessor(chan3_preproc=True)
    xb = jnp.zeros((2, 64, 64, 1), jnp.float32)
    prims = primitives_of(lambda t: pipe.apply_batch(t), xb)
    assert not {p for p in prims if "scatter" in p}
    sizes = []
    jaxpr = jax.make_jaxpr(lambda t: pipe.apply_batch(t))(xb)
    _sort_sizes(jaxpr.jaxpr, sizes)
    assert all(s <= 2048 for s in sizes), (
        f"large sort in chan3 batch path (sizes={sizes})")
