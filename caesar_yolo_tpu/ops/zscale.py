"""ZScale display-interval algorithm (IRAF zscale) as fixed-shape JAX.

Reimplements the algorithm used by the reference via astropy's
ZScaleInterval (reference preprocessing.py:964): subsample the image,
sort, iteratively fit a line to the sorted samples with k-sigma rejection
and mask dilation, then derive display limits from the fitted slope and
the sample median.  Iterations run under lax.while_loop; sample counts and
strides are static (image shapes are static under jit).

Defaults mirror astropy: nsamples=1000, contrast=0.25, max_reject=0.5,
min_npixels=5, krej=2.5, max_iterations=5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=(
    "nsamples", "contrast", "max_reject", "min_npixels", "krej",
    "max_iterations"))
def zscale_limits(values: jnp.ndarray, contrast: float = 0.25,
                  nsamples: int = 1000, max_reject: float = 0.5,
                  min_npixels: int = 5, krej: float = 2.5,
                  max_iterations: int = 5):
    """Return (vmin, vmax) zscale limits of an array.

    NaN/inf handling: astropy filters non-finite values before sampling;
    under jit we cannot compact, so callers must pass finite data (the
    pipeline zeroes non-finite pixels at read time, reference utils.py:219;
    zeros are legitimately included in zscale sampling — the reference
    applies ZScaleInterval to the full channel including masked zeros,
    preprocessing.py:962-966).
    """
    flat = values.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    # astropy: stride = int(max(1.0, size / nsamples)); samples[:nsamples]
    stride = int(max(1.0, n / nsamples))
    samples = flat[::stride][:nsamples]
    v = jnp.sort(samples)
    npix = v.shape[0]
    vmin0, vmax0 = v[0], v[-1]

    minpix = max(min_npixels, int(npix * max_reject))
    ngrow = max(1, int(npix * 0.01))
    x = jnp.arange(npix, dtype=jnp.float32)
    kernel = jnp.ones((ngrow,), dtype=jnp.float32)
    center = (npix - 1) // 2
    median = 0.5 * (v[(npix - 1) // 2] + v[npix // 2])
    # fit on median-centered samples: the slope is shift-invariant, but
    # centering keeps the x*v accumulations at the scale of the sample
    # SPREAD rather than the sample magnitude — on f32 a large DC
    # offset (e.g. ~1e6 counts) otherwise injects ulp(offset)-scale
    # noise into the fitted slope
    v = v - median

    def body(_, state):
        bad, ngood, _, _ = state
        w = (~bad).astype(jnp.float32)
        # Weighted least-squares line fit (weights in {0,1} make
        # np.polyfit's squared-weight convention equivalent).
        sw = jnp.sum(w)
        sx = jnp.sum(w * x)
        sy = jnp.sum(w * v)
        sxx = jnp.sum(w * x * x)
        sxy = jnp.sum(w * x * v)
        denom = sw * sxx - sx * sx
        slope = jnp.where(denom != 0, (sw * sxy - sx * sy) / denom, 0.0)
        intercept = (sy - slope * sx) / jnp.maximum(sw, 1.0)
        flat_resid = v - (intercept + slope * x)
        # k-sigma threshold over currently-good pixels (ddof=0 std)
        mu = jnp.sum(w * flat_resid) / jnp.maximum(sw, 1.0)
        var = jnp.maximum(
            jnp.sum(w * flat_resid * flat_resid) / jnp.maximum(sw, 1.0)
            - mu * mu, 0.0)
        threshold = krej * jnp.sqrt(var)
        new_bad = bad | (flat_resid < -threshold) | (flat_resid > threshold)
        # Dilate mask with ones(ngrow) kernel (bool convolve, mode='same')
        new_bad = jnp.convolve(new_bad.astype(jnp.float32), kernel,
                               mode="same") > 0
        # freeze once below minpix (astropy stops there; the mask is
        # monotone so later iterations cannot recover — fixed-count loop
        # with freezing matches the early-exit semantics)
        keep_going = ngood >= minpix
        new_bad = jnp.where(keep_going, new_bad, bad)
        slope = jnp.where(keep_going, slope, state[3])
        new_ngood = jnp.sum(~new_bad).astype(jnp.int32)
        return new_bad, new_ngood, ngood, slope

    init = (jnp.zeros((npix,), dtype=bool), jnp.int32(npix),
            jnp.int32(npix + 1), jnp.float32(0.0))
    _, ngood, _, slope = lax.fori_loop(0, max_iterations, body, init)

    fitted_ok = ngood >= minpix
    if contrast > 0:
        slope = slope / contrast
    vmin = jnp.maximum(vmin0, median - (center - 1) * slope)
    vmax = jnp.minimum(vmax0, median + (npix - center) * slope)
    vmin = jnp.where(fitted_ok, vmin, vmin0)
    vmax = jnp.where(fitted_ok, vmax, vmax0)
    # Degenerate-fit guard (deliberate divergence from astropy, in the
    # spirit of its own min_npixels fallback): when the rejected-fit
    # slope collapses to ~0 — e.g. >90% of pixels share one value after
    # a sigma_low=0 clip clamps them to the (now exact) median — astropy
    # returns vmin == vmax == median and the reference's normalization
    # then divides by zero, NaN-filling the channel
    # (reference preprocessing.py:964-971).  Fall back to the full
    # sample range instead, like the failed-fit branch above.
    # The threshold must NOT scale with the full sample range: a tile
    # whose range is dominated by one bright source (~1e7 counts over
    # ~unit noise) has a legitimate few-unit zscale interval that a
    # range-relative test would spuriously reject.  With the fit
    # median-centered above, a flat fit's slope noise is at the ulp
    # scale of the fitted ENDPOINTS — gate on that magnitude, with a
    # range-scaled floor only at the 1e-12 level for median==0 tiles.
    scale = jnp.maximum(jnp.abs(vmin), jnp.abs(vmax))
    bad_interval = ~(vmax - vmin
                     > scale * 1e-5 + (vmax0 - vmin0) * 1e-12)
    vmin = jnp.where(bad_interval, vmin0, vmin)
    vmax = jnp.where(bad_interval, vmax0, vmax)
    return vmin, vmax


def zscale_transform(values: jnp.ndarray, contrast: float = 0.25,
                     **kwargs) -> jnp.ndarray:
    """Map values through the zscale interval to [0, 1] (clipped).

    Equivalent to astropy ZScaleInterval.__call__(values, clip=True).
    """
    vmin, vmax = zscale_limits(values, contrast=contrast, **kwargs)
    span = vmax - vmin
    out = jnp.where(span != 0, (values - vmin) / jnp.where(span != 0, span, 1.0),
                    values - vmin)
    return jnp.clip(out, 0.0, 1.0)
