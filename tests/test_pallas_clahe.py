"""Pallas CLAHE kernels: parity + lowering regression.

The adaptive branch of the reference HistEqualizer
(reference preprocessing.py:1004-1008 -> skimage equalize_adapthist)
maps to ops/clahe.py (XLA, scatter-add histograms + 4-table gathers) —
exactly the op classes that hung the TPU on plain hist-eq in round 2.
ops/pallas_clahe.py is the TPU-native lowering: VMEM-resident per-tile
histograms (occupied-span count loops, no scatter) and a hat-weight
telescoping-CDF blend (no gather).  These tests pin numeric parity of
the Pallas batch path against the XLA reference formulation and that
no sort/searchsorted/scatter/gather primitive appears in its program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_yolo_tpu.ops.clahe import equalize_adapthist
from caesar_yolo_tpu.ops.pallas_clahe import equalize_adapthist_batch
from caesar_yolo_tpu.ops.transforms import Pipeline, hist_equalizer


def radio_batch(rng, b, h, w):
    x = rng.standard_normal((b, h, w)).astype(np.float32)
    for i in range(b):
        cy = int(rng.integers(12, h - 12))
        cx = int(rng.integers(12, w - 12))
        x[i, cy - 4:cy + 4, cx - 4:cx + 4] += 150.0
    return x


@pytest.mark.parametrize("shape", [(2, 132, 132), (1, 64, 64),
                                   (2, 128, 256), (1, 96, 100)])
def test_clahe_batch_parity(rng, shape):
    x = radio_batch(rng, *shape)
    ref = np.stack([np.asarray(equalize_adapthist(jnp.asarray(im)))
                    for im in x])
    got = np.asarray(equalize_adapthist_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_clahe_batch_parity_clip_limit(rng):
    x = radio_batch(rng, 2, 96, 96)
    ref = np.stack([np.asarray(equalize_adapthist(jnp.asarray(im),
                                                  clip_limit=0.01))
                    for im in x])
    got = np.asarray(equalize_adapthist_batch(jnp.asarray(x),
                                              clip_limit=0.01))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_clahe_constant_image():
    x = jnp.full((1, 64, 64), 7.0, jnp.float32)
    out = np.asarray(equalize_adapthist_batch(x))
    assert np.isfinite(out).all()


def test_hist_equalizer_adaptive_batch_matches_per_image(rng):
    x = radio_batch(rng, 3, 64, 64)[..., None]
    pipe = Pipeline([hist_equalizer(adaptive=True)])
    out_b, ok_b = pipe.apply_batch(jnp.asarray(x))
    for i in range(x.shape[0]):
        out_i, _ = pipe(jnp.asarray(x[i]))
        np.testing.assert_allclose(np.asarray(out_b[i]),
                                   np.asarray(out_i), atol=3e-5)
    assert np.asarray(ok_b).all()


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


def test_clahe_batch_lowering_has_no_sort_or_scatter():
    """Regression guard: the TPU path (kernels + glue) must never
    contain the scatter-add histogram or LUT-gather formulations."""
    xb = jnp.zeros((2, 64, 64), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda t: equalize_adapthist_batch(t))(xb)
    seen = set()
    _walk_eqns(jaxpr.jaxpr, seen)
    bad = {p for p in seen if any(f in p for f in FORBIDDEN)}
    assert not bad, f"forbidden primitives in CLAHE batch path: {bad}"

# -- Zuiderveld property tests -------------------------------------------
# skimage remains uninstallable here (pip re-attempted 2026-08-19, pypi
# unreachable), so beyond the independent-twin parity above, parity with
# `equalize_adapthist` rests on the PUBLISHED invariants of Zuiderveld's
# algorithm (Graphics Gems IV, 1994) — pinned here so drift cannot hide
# in a single twin (VERDICT r3 next-round #8).


def test_clahe_affine_intensity_invariance(rng):
    """CLAHE normalizes by the image min/max before binning, so any
    positive affine intensity transform must leave the output EXACTLY
    unchanged (skimage rescales to [0,1] the same way)."""
    x = radio_batch(rng, 1, 96, 96)[0]
    a = np.asarray(equalize_adapthist(jnp.asarray(x)))
    b = np.asarray(equalize_adapthist(jnp.asarray(3.5 * x + 11.0)))
    np.testing.assert_array_equal(a, b)


def test_clahe_clip_limit_monotonicity(rng):
    """Clip-limit monotonicity: the smaller the clip limit, the more of
    each tile histogram is redistributed uniformly, so the mapping
    approaches the identity on the normalized input; as clip_limit -> 1
    it approaches unclipped AHE (maximum equalization).  The mean
    distance from the normalized input must be non-decreasing in
    clip_limit, and both endpoints must separate."""
    x = radio_batch(rng, 1, 96, 96)[0]
    norm = (x - x.min()) / (x.max() - x.min())
    dists = []
    for cl in (0.002, 0.01, 0.03, 0.1, 0.5, 1.0):
        o = np.asarray(equalize_adapthist(jnp.asarray(x), clip_limit=cl))
        dists.append(float(np.abs(o - norm).mean()))
    for lo, hi in zip(dists, dists[1:]):
        assert lo <= hi + 1e-6, f"not monotone: {dists}"
    assert dists[-1] > 4 * dists[0]


def test_clahe_uniform_image_fixpoint():
    """A uniform image has nothing to equalize: the output must be
    uniform too (and finite) — the degenerate-span guard, the clipped
    histogram, and the CDF blend must all collapse consistently."""
    out = np.asarray(equalize_adapthist(jnp.full((64, 64), 7.0,
                                                 jnp.float32)))
    assert np.isfinite(out).all()
    assert out.max() - out.min() == 0.0


def test_clahe_tile_boundary_continuity():
    """The hat-weight (bilinear) blend of neighboring tile CDFs is the
    defining trick of Zuiderveld's CLAHE: mappings change CONTINUOUSLY
    across tile boundaries.  On a smooth ramp input, the output step
    across every tile boundary must be no larger than the largest step
    within tiles (a per-tile LUT without blending fails this with a
    visible seam)."""
    yy, xx = np.mgrid[0:96, 0:96]
    ramp = (xx + yy).astype(np.float32)
    o = np.asarray(equalize_adapthist(jnp.asarray(ramp)))
    dif = np.abs(np.diff(o, axis=1))
    tile_w = 96 // 8
    bcols = [tile_w * k - 1 for k in range(1, 8)]
    icols = [c for c in range(95) if c not in bcols]
    assert dif[:, bcols].max() <= dif[:, icols].max()
    assert (o >= 0).all() and (o <= 1).all()


def test_clahe_pallas_batch_obeys_same_invariants(rng):
    """The Pallas batch lowering satisfies the same published
    invariants directly (not only via parity with the XLA twin)."""
    x = radio_batch(rng, 1, 96, 96)
    a = np.asarray(equalize_adapthist_batch(jnp.asarray(x)))
    b = np.asarray(equalize_adapthist_batch(jnp.asarray(2.0 * x + 3.0)))
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a <= 1).all()
