"""Contrast-limited adaptive histogram equalization (CLAHE) in JAX.

Completes the reference HistEqualizer's adaptive branch
(reference preprocessing.py:1006 -> skimage.exposure.equalize_adapthist):
the image is split into a grid of contextual tiles, each tile gets a
clip-limited, excess-redistributed histogram CDF, and every pixel maps
through a bilinear blend of the four surrounding tile CDFs.  All shapes
are static (grid fixed at trace time), so it jits and vmaps.

Semantics follow the canonical published algorithm (Zuiderveld 1994)
with skimage's parameterization: kernel size defaults to shape//8
(grid=8), nbins=256, clip limit relative to the per-tile pixel count,
and ITERATIVE excess redistribution (redistributed mass that re-exceeds
the clip is re-clipped until stable — the single-pass shortcut biases
heavy-tailed histograms).  skimage itself is not installed in this
environment, so parity is tolerance-tested against an independent numpy
twin of the same published algorithm (tests/test_ops_transforms.py)
rather than recorded skimage outputs; the reference only reaches this
branch through the class API (reference preprocessing.py:1004-1008),
never from its CLI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def clip_redistribute(hist, npix, clip_limit, nbins):
    """Clip + iterative excess redistribution over per-tile histograms
    (the published algorithm's contrast limiting; iterative until no
    bin re-exceeds the limit — fixed trip count, the mass above the
    limit shrinks geometrically and 8 sweeps reach float eps).
    hist: [..., nbins]; shared by the XLA path below and the Pallas
    batch path (ops/pallas_clahe.py) so the clip semantics cannot
    drift between the two parity-pinned formulations."""
    limit = jnp.maximum(clip_limit * npix, 1.0)

    def sweep(_, hst):
        excess = jnp.sum(jnp.maximum(hst - limit, 0.0), axis=-1,
                         keepdims=True)
        return jnp.minimum(hst, limit) + excess / nbins

    return jax.lax.fori_loop(0, 8, sweep, hist)


@partial(jax.jit, static_argnames=("nbins", "grid", "clip_limit"))
def equalize_adapthist(values: jnp.ndarray, clip_limit: float = 0.03,
                       nbins: int = 256, grid: int = 8) -> jnp.ndarray:
    """CLAHE over a 2D array; returns float32 in [0, 1]."""
    x = values.astype(jnp.float32)
    h, w = x.shape
    vmin = jnp.min(x)
    vmax = jnp.max(x)
    span = jnp.where(vmax > vmin, vmax - vmin, 1.0)
    norm = (x - vmin) / span                                  # [0, 1]
    bins = jnp.clip((norm * nbins).astype(jnp.int32), 0, nbins - 1)

    # pad to a multiple of the grid (reflect, like skimage)
    th = -(-h // grid)
    tw = -(-w // grid)
    ph, pw = th * grid - h, tw * grid - w
    bins_p = jnp.pad(bins, ((0, ph), (0, pw)), mode="reflect")

    # per-tile histograms via one scatter-add into [grid*grid, nbins]
    tiles = bins_p.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(grid * grid, th * tw)
    tile_ids = jnp.arange(grid * grid, dtype=jnp.int32)[:, None]
    flat_idx = (tile_ids * nbins + tiles).reshape(-1)
    hist = jnp.zeros((grid * grid * nbins,), jnp.float32).at[flat_idx].add(
        1.0).reshape(grid * grid, nbins)

    hist = clip_redistribute(hist, th * tw, clip_limit, nbins)

    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    cdf = cdf.reshape(grid, grid, nbins)

    # bilinear blend of the 4 surrounding tile mappings per pixel
    yy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5   # tile coords
    xx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(yy - y0.astype(jnp.float32), 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0.astype(jnp.float32), 0.0, 1.0)[None, :]

    def look(ty, tx):
        # cdf[ty[i], tx[j], bins[i, j]] for every pixel
        return cdf[ty[:, None], tx[None, :], bins]

    v00 = look(y0, x0)
    v01 = look(y0, x1)
    v10 = look(y1, x0)
    v11 = look(y1, x1)
    out = ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
           + (v10 * (1 - fx) + v11 * fx) * fy)
    return out
