"""Masked, fixed-shape statistical kernels for astronomical preprocessing.

Recasts the iterative astropy algorithms the reference leans on
(sigma_clipped_stats / sigma_clip, reference preprocessing.py:629,683,742)
as jit-compilable JAX with **no large sorts**: medians come from a
value-domain bisection on order statistics (a handful of masked-count
reductions), spreads from masked moments, and the clip loop carries the
shrinking membership mask under lax.while_loop.  This matters on TPU:
an O(N log N) sort of a full 640x640 tile is pathologically slow there,
while ~40 O(N) vector reductions stream at HBM bandwidth.

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

BISECT_BRANCH = 16   # thresholds probed per refinement step
BISECT_STEPS = 6     # 16^6 = 2^24: the full f32 mantissa resolution


def _order_stat(flat, mask, k, lo0, hi0, steps=BISECT_STEPS,
                branch=BISECT_BRANCH):
    """Approximate the k-th order statistic (1-based) of flat[mask] by
    k-ary search on the value domain: the smallest m with
    count(x<=m) >= k.  Each step probes `branch-1` thresholds in ONE pass
    over the data (a batched masked count), shrinking the bracket by
    `branch` — sequential depth `steps`, not 40 binary probes.
    Invariant: count(<=lo) < k <= count(<=hi)."""
    fracs = jnp.arange(1, branch, dtype=jnp.float32) / branch

    def body(_, state):
        lo, hi = state
        thr = lo + (hi - lo) * fracs                    # [branch-1]
        counts = jnp.sum(mask[:, None] & (flat[:, None] <= thr[None, :]),
                         axis=0)                        # [branch-1]
        ge = counts >= k
        # new hi: smallest threshold whose count >= k (or keep hi)
        hi_new = jnp.where(jnp.any(ge), thr[jnp.argmax(ge)], hi)
        # new lo: largest threshold whose count < k (or keep lo)
        lt = ~ge
        lo_new = jnp.where(jnp.any(lt),
                           thr[(branch - 2) - jnp.argmax(lt[::-1])], lo)
        return lo_new, hi_new

    lo, hi = lax.fori_loop(0, steps, body, (lo0, hi0))
    # Exact pin: the k-th value lies in (lo, hi].  m1 = smallest member
    # there is the (count(lo)+1)-th order stat; if its cumulative count
    # reaches k it IS the k-th (everything smaller is <= lo, and
    # count(lo) < k).  Otherwise try the next distinct member; beyond
    # that fall back to hi (bracket width span/16^steps).  This makes
    # the result exact in all but astronomically tight-duplicate cases —
    # and, critically, makes independent implementations (the Pallas
    # batch kernel) agree bit-for-bit instead of within bracket width.
    inf = jnp.float32(jnp.inf)
    in_bracket = mask & (flat > lo) & (flat <= hi)
    m1 = jnp.min(jnp.where(in_bracket, flat, inf))
    c1 = jnp.sum(mask & (flat <= m1))
    m2 = jnp.min(jnp.where(in_bracket & (flat > m1), flat, inf))
    return jnp.where(c1 >= k, m1, jnp.where(jnp.isfinite(m2), m2, hi))


def masked_median(flat, mask, n, lo0, hi0):
    """Median of flat[mask] (n = count) as the average of the two middle
    order statistics, sort-free."""
    n = jnp.maximum(n, 1)
    k1 = (n + 1) // 2
    k2 = n // 2 + 1
    m1 = _order_stat(flat, mask, k1, lo0, hi0)
    m2 = jnp.where(k2 == k1, m1, _order_stat(flat, mask, k2, lo0, hi0))
    return 0.5 * (m1 + m2)


def _moments(flat, mask):
    n = jnp.sum(mask).astype(flat.dtype)
    v = jnp.where(mask, flat, 0.0)
    s1 = jnp.sum(v)
    s2 = jnp.sum(v * v)
    nsafe = jnp.maximum(n, 1.0)
    mean = s1 / nsafe
    var = jnp.maximum(s2 / nsafe - mean * mean, 0.0)
    return mean, jnp.sqrt(var), n


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
    m0 = mask.reshape(-1)
    n_valid = jnp.sum(m0).astype(jnp.int32)
    # global bisection range (fixed across iterations: the set only shrinks)
    vmin = jnp.min(jnp.where(m0, flat, jnp.inf))
    vmax = jnp.max(jnp.where(m0, flat, -jnp.inf))
    span = jnp.maximum(vmax - vmin, 0.0)
    # strictly below vmin even for large-magnitude values (f32 rounding)
    lo0 = vmin - jnp.maximum(span, jnp.abs(vmin)) * 1e-5 - 1e-30

    def stats_of(mask_cur):
        n = jnp.sum(mask_cur)
        med = masked_median(flat, mask_cur, n, lo0, vmax)
        mean, std, _ = _moments(flat, mask_cur)
        return n, med, mean, std

    # Fixed-count loop: once the clipped set stops changing, the body is
    # idempotent (same median/std -> same bounds -> same mask), so running
    # to maxiters matches astropy's early-exit semantics.  A batched
    # while_loop would run converged lanes anyway under vmap; fori lowers
    # more simply.
    def body(_, state):
        mask_cur, _, _ = state
        _, med, _, std = stats_of(mask_cur)
        lower = med - sigma_low * std
        upper = med + sigma_up * std
        new_mask = mask_cur & (flat >= lower) & (flat <= upper)
        return new_mask, lower, upper

    init = (m0, jnp.float32(jnp.nan), jnp.float32(jnp.nan))
    mask_fin, lower, upper = lax.fori_loop(0, maxiters, body, init)

    n, med, mean, std = stats_of(mask_fin)
    empty = n_valid == 0
    nanf = jnp.float32(jnp.nan)
    return (jnp.where(empty, nanf, mean), jnp.where(empty, nanf, med),
            jnp.where(empty, nanf, std), jnp.where(empty, nanf, lower),
            jnp.where(empty, nanf, upper), n_valid)


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
