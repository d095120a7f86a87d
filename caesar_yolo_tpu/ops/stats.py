"""Masked, fixed-shape statistical kernels for astronomical preprocessing.

Recasts the iterative astropy algorithms the reference leans on
(sigma_clipped_stats / sigma_clip, reference preprocessing.py:629,683,742)
as jit-compilable JAX: data is sorted once, the clipped set is always a
contiguous [lo, hi) window of the sorted array (clipping removes extremes),
and iterations run under lax.while_loop with static shapes.

Conventions (matching astropy defaults used by the reference):
  - center function: median; spread: std with ddof=0
  - maxiters: 5
  - clip keeps values v with lower <= v <= upper (bounds inclusive)
  - stats are computed over the final clipped set
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def masked_median_sorted(v_sorted: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """Median of the window [lo, hi) of an ascending-sorted 1D array."""
    m = hi - lo
    i0 = lo + jnp.maximum(m - 1, 0) // 2
    i1 = lo + m // 2
    return 0.5 * (v_sorted[i0] + v_sorted[i1])


def _window_stats(v_sorted, idx, lo, hi):
    m = (hi - lo).astype(v_sorted.dtype)
    inwin = (idx >= lo) & (idx < hi)
    vv = jnp.where(inwin, v_sorted, 0.0)
    s1 = jnp.sum(vv)
    s2 = jnp.sum(vv * vv)
    msafe = jnp.maximum(m, 1.0)
    mean = s1 / msafe
    var = jnp.maximum(s2 / msafe - mean * mean, 0.0)
    std = jnp.sqrt(var)
    med = masked_median_sorted(v_sorted, lo, hi)
    return mean, med, std


@partial(jax.jit, static_argnames=("maxiters",))
def sigma_clipped_stats(values: jnp.ndarray, mask: jnp.ndarray,
                        sigma_low: float, sigma_up: float,
                        maxiters: int = 5):
    """Sigma-clipped (mean, median, std, lower_bound, upper_bound, nvalid).

    values: any-shape array; mask: same-shape bool (True = use pixel).
    Matches astropy.stats.sigma_clipped_stats / sigma_clip(return_bounds)
    semantics with cenfunc=median, stdfunc=std.  An empty mask yields NaN
    stats and nvalid=0 (callers treat that as invalid data, mirroring the
    reference's 'return None' paths).
    """
    flat = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n = flat.shape[0]
    v = jnp.sort(jnp.where(m, flat, jnp.inf))
    n_valid = jnp.sum(m).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        lo, hi, it, _, _, _ = state
        _, med, std = _window_stats(v, idx, lo, hi)
        lower = med - sigma_low * std
        upper = med + sigma_up * std
        nlo = jnp.searchsorted(v, lower, side="left").astype(jnp.int32)
        nhi = jnp.searchsorted(v, upper, side="right").astype(jnp.int32)
        nlo = jnp.clip(nlo, lo, hi)  # window can only shrink
        nhi = jnp.clip(nhi, nlo, hi)
        changed = (nlo != lo) | (nhi != hi)
        return nlo, nhi, it + 1, changed, lower, upper

    def cond(state):
        lo, hi, it, changed, _, _ = state
        return changed & (it < maxiters) & (hi - lo > 0)

    init = (jnp.int32(0), n_valid, jnp.int32(0), jnp.bool_(True),
            jnp.float32(jnp.nan), jnp.float32(jnp.nan))
    lo, hi, _, _, lower, upper = lax.while_loop(cond, body, init)

    mean, med, std = _window_stats(v, idx, lo, hi)
    empty = n_valid == 0
    nanf = jnp.float32(jnp.nan)
    return (jnp.where(empty, nanf, mean), jnp.where(empty, nanf, med),
            jnp.where(empty, nanf, std), lower, upper, n_valid)


def sigma_clip_bounds(values, mask, sigma_low, sigma_up, maxiters: int = 5):
    """Final (lower, upper) clip bounds, as astropy sigma_clip(return_bounds).

    Used by the SigmaClipper transform (reference preprocessing.py:742-748).
    """
    _, _, _, lower, upper, _ = sigma_clipped_stats(
        values, mask, sigma_low, sigma_up, maxiters)
    return lower, upper


def masked_min(values, mask, axis=None):
    """Min over mask==True elements (inf where mask empty)."""
    return jnp.min(jnp.where(mask, values, jnp.inf), axis=axis)


def masked_max(values, mask, axis=None):
    """Max over mask==True elements (-inf where mask empty)."""
    return jnp.max(jnp.where(mask, values, -jnp.inf), axis=axis)
