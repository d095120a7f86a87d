"""Pallas TPU kernel for batched sigma-clipped statistics.

The astropy sigma_clipped_stats recast in ops/stats.py (value-domain
k-ary order-statistic search) is algorithmically sort-free, but XLA
lowers its [N, 15] threshold-count passes through HBM: measured 97.5 ms
per sigma_clipped_stats application at batch 128 of 640px tiles on v5e
(scripts/probe_preproc_tpu.py bkgsub mode) — ~7x above the pure op-count
floor.  chan3 runs TWO more of these (reference preprocessing.py:
1030-1040), so the full BASELINE config[1] chain paid it three times.

This kernel runs the ENTIRE clip loop on a VMEM-resident tile: one HBM
read per tile, then
  - binary value-domain bisection for the two middle order statistics
    (24 rounds = full f32 mantissa resolution, same 2^24 bracket as the
    XLA version's 16^6), with the k2 bracket sharing k1's counts until
    the brackets diverge (k2 = k1+1: they split at most once);
  - masked moments for mean/std;
  - the 5-iteration astropy clip loop around both,
all in registers/VMEM.  Semantics identical to ops/stats.
sigma_clipped_stats (cenfunc=median, stdfunc=std ddof=0, bounds
inclusive, empty mask -> NaN stats).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU
BISECT_ROUNDS = 24


def _use_interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"


def _count_le(xm, thr):
    """#finite masked values <= thr (masked-out values are +inf)."""
    return jnp.sum((xm <= thr).astype(jnp.float32))


def _order_stat_pair(xm, k1, k2, lo0, hi0):
    """(k1-th, k2-th) order statistics (1-based, k2 in {k1, k1+1}) of the
    masked values via shared binary bisection.  Returns the bracket-top
    values, resolution (hi0-lo0)/2^24."""
    k1f = k1.astype(jnp.float32)
    k2f = k2.astype(jnp.float32)

    def body(_, st):
        lo1, hi1, lo2, hi2 = st
        mid1 = 0.5 * (lo1 + hi1)
        cnt1 = _count_le(xm, mid1)
        ge1 = cnt1 >= k1f
        lo1n = jnp.where(ge1, lo1, mid1)
        hi1n = jnp.where(ge1, mid1, hi1)

        same = jnp.logical_and(lo1 == lo2, hi1 == hi2)
        mid2 = 0.5 * (lo2 + hi2)
        # shared bracket: reuse cnt1 (mid2 == mid1); else recount
        cnt2 = lax.cond(same, lambda: cnt1, lambda: _count_le(xm, mid2))
        ge2 = cnt2 >= k2f
        lo2n = jnp.where(ge2, lo2, mid2)
        hi2n = jnp.where(ge2, mid2, hi2)
        return lo1n, hi1n, lo2n, hi2n

    lo1, hi1, lo2, hi2 = lax.fori_loop(
        0, BISECT_ROUNDS, body, (lo0, hi0, lo0, hi0))

    # Exact pin (mirrors ops/stats._order_stat): the k-th value is the
    # smallest bracket member whose cumulative count reaches k; fall
    # back to the next distinct member, then to hi.
    inf = jnp.float32(jnp.inf)

    def pin(lo, hi, kf):
        in_b = jnp.logical_and(xm > lo, xm <= hi)
        m1 = jnp.min(jnp.where(in_b, xm, inf))
        c1 = _count_le(xm, m1)
        m2 = jnp.min(jnp.where(jnp.logical_and(in_b, xm > m1), xm, inf))
        return jnp.where(c1 >= kf, m1,
                         jnp.where(jnp.isfinite(m2), m2, hi))

    return pin(lo1, hi1, k1f), pin(lo2, hi2, k2f)


def _sigma_clip_kernel(x_ref, m_ref, sig_ref, out_ref, *, maxiters):
    x = x_ref[0]
    m0 = m_ref[0] != 0
    sigma_low = sig_ref[0, 0, 0]
    sigma_up = sig_ref[0, 0, 1]

    inf = jnp.float32(jnp.inf)
    n_valid = jnp.sum(m0.astype(jnp.float32))
    vmin = jnp.min(jnp.where(m0, x, inf))
    vmax = jnp.max(jnp.where(m0, x, -inf))
    span = jnp.maximum(vmax - vmin, 0.0)
    lo0 = vmin - jnp.maximum(span, jnp.abs(vmin)) * 1e-5 - 1e-30

    def stats_of(lower, upper):
        keep = jnp.logical_and(m0, jnp.logical_and(x >= lower, x <= upper))
        xm = jnp.where(keep, x, inf)
        n = jnp.sum(keep.astype(jnp.float32))
        ni = jnp.maximum(n, 1.0)
        k1 = jnp.floor((ni + 1.0) * 0.5)
        k2 = jnp.floor(ni * 0.5) + 1.0
        m1, m2 = _order_stat_pair(xm, k1, k2, lo0, vmax)
        med = 0.5 * (m1 + jnp.where(k2 == k1, m1, m2))
        v = jnp.where(keep, x, 0.0)
        s1 = jnp.sum(v)
        s2 = jnp.sum(v * v)
        mean = s1 / ni
        var = jnp.maximum(s2 / ni - mean * mean, 0.0)
        return n, med, mean, jnp.sqrt(var)

    # The surviving set is the INTERSECTION of every iteration's bounds
    # (astropy: a clipped value stays clipped even if later bounds would
    # re-admit it) — an interval [lo_acc, up_acc].  The RETURNED bounds
    # are the raw last-iteration ones, matching ops/stats.
    def body(_, st):
        lo_acc, up_acc, _, _ = st
        _, med, _, std = stats_of(lo_acc, up_acc)
        lower = med - sigma_low * std
        upper = med + sigma_up * std
        return (jnp.maximum(lo_acc, lower), jnp.minimum(up_acc, upper),
                lower, upper)

    lo_acc, up_acc, lower, upper = lax.fori_loop(
        0, maxiters, body, (-inf, inf, -inf, inf))
    n, med, mean, std = stats_of(lo_acc, up_acc)

    empty = n_valid == 0.0
    nan = jnp.float32(jnp.nan)
    out_ref[0, 0, 0] = jnp.where(empty, nan, mean)
    out_ref[0, 0, 1] = jnp.where(empty, nan, med)
    out_ref[0, 0, 2] = jnp.where(empty, nan, std)
    out_ref[0, 0, 3] = jnp.where(empty, nan, lower)
    out_ref[0, 0, 4] = jnp.where(empty, nan, upper)
    out_ref[0, 0, 5] = n_valid


@functools.partial(jax.jit, static_argnames=("maxiters",))
def sigma_clipped_stats_batch(values: jnp.ndarray, mask: jnp.ndarray,
                              sigma_low: float, sigma_up: float,
                              maxiters: int = 5):
    """Batched sigma-clipped stats: values/mask [B, H, W] ->
    (mean, median, std, lower, upper, nvalid) each [B].

    Same semantics as ops/stats.sigma_clipped_stats per image; the whole
    clip loop runs VMEM-resident per tile (one HBM read)."""
    b, h, w = values.shape
    x = values.astype(jnp.float32)
    mf = mask.astype(jnp.float32)
    sig = jnp.broadcast_to(
        jnp.asarray([sigma_low, sigma_up], jnp.float32), (b, 1, 2))

    img_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sigma_clip_kernel, maxiters=maxiters),
        grid=(b,),
        in_specs=[img_spec, img_spec,
                  pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, 6), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 6), jnp.float32),
        # two [H, W] f32 inputs + live where/compare temps exceed the
        # 16 MB default scoped-vmem at 640px; v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x, mf, sig)
    out = out[:, 0, :]
    n = out[:, 5].astype(jnp.int32)
    return (out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4], n)


def sigma_clip_bounds_batch(values, mask, sigma_low, sigma_up,
                            maxiters: int = 5):
    """Batched final (lower, upper) clip bounds, each [B]."""
    _, _, _, lower, upper, _ = sigma_clipped_stats_batch(
        values, mask, sigma_low, sigma_up, maxiters)
    return lower, upper
