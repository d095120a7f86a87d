"""Pallas TPU kernels for CLAHE (contrast-limited adaptive hist-eq).

Completes the TPU story for the reference HistEqualizer's adaptive
branch (reference preprocessing.py:1004-1008 -> skimage
equalize_adapthist): ops/clahe.py implements the Zuiderveld algorithm as
XLA, but its per-contextual-tile scatter-add histograms and
4-table-per-pixel CDF gathers are exactly the op classes that hung /
crawled on this TPU backend (see ops/pallas_histeq.py for the
measurements on plain hist-eq — scatter did not finish at 640 px).
These kernels keep everything VMEM/SMEM-resident:

  * per-tile histograms: one grid step per contextual-tile ROW; the
    whole padded image stays VMEM-resident across steps, each of the
    row's tiles gets an occupied-bin-span count loop with scalar SMEM
    stores (no scatter);
  * CDF apply + bilinear blend: rewritten as a sum of per-tile "hat"
    contributions — out = sum_t wy_t*wx_t * cdf_t[bin] over the 4 tiles
    whose hat supports each pixel.  Hat weights are iota-built
    clamped-coordinate triangles (algebraically equal to the reference's
    clipped-index bilinear blend, support bounds static per tile),
    cdf_t[bin] is the exact telescoping step identity
    cdf[bmin-1] + sum_b d[b]*(bin >= b) over the tile's occupied span —
    no gather.

Numerics match ops/clahe.equalize_adapthist (same global-range binning,
same iterative clip redistribution, same blend) to float accumulation
order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBINS = 256
INTERPRET = False  # tests flip this on CPU


def _use_interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"


def _bins_of(x, vmin, span):
    norm = (x - vmin) / span
    return jnp.clip((norm * NBINS).astype(jnp.int32), 0, NBINS - 1)


def _hist_kernel(xp_ref, vlim_ref, out_ref, *, grid, th, tw):
    """Grid (B, grid).  Step gy histograms the gy-th row of contextual
    tiles; the row-band arrives as this step's block (the index map
    slides one band per step — in-kernel dynamic sublane slices at
    non-8-multiple offsets do not lower on Mosaic)."""
    vmin = vlim_ref[0, 0, 0]
    span = vlim_ref[0, 0, 1]
    band = xp_ref[0, 0]
    bins_band = _bins_of(band, vmin, span)

    for gx in range(grid):
        sub = bins_band[:, gx * tw:(gx + 1) * tw]
        bmin = jnp.min(sub)
        bmax = jnp.max(sub)

        def zero(b, _):
            out_ref[0, 0, gx, b] = 0.0
            return 0
        lax.fori_loop(0, NBINS, zero, 0)

        def count(b, _):
            @pl.when(jnp.logical_and(b >= bmin, b <= bmax))
            def _():
                out_ref[0, 0, gx, b] = jnp.sum(
                    (sub == b).astype(jnp.float32))
            return 0
        lax.fori_loop(0, NBINS, count, 0)


def _hat_1d(n: int, tiles: int, t: int, tsize: int) -> tuple[int, int]:
    """Trace-time support bounds [start, stop) of tile t's triangular
    hat weight over n pixels, on clamped tile coordinates (equals the
    reference's clipped-index bilinear blend)."""
    cc = np.clip((np.arange(n) + 0.5) / tsize - 0.5, 0.0, tiles - 1)
    w = np.maximum(0.0, 1.0 - np.abs(cc - t))
    nz = np.nonzero(w > 0)[0]
    return int(nz[0]), int(nz[-1]) + 1


def _blend_kernel(x_ref, vlim_ref, cdf0_ref, out_ref, *, grid, th, tw,
                  h, w):
    vmin = vlim_ref[0, 0, 0]
    span = vlim_ref[0, 0, 1]
    bins = _bins_of(x_ref[0], vmin, span)
    out_ref[0] = jnp.zeros((h, w), jnp.float32)

    for ty in range(grid):
        r0, r1 = _hat_1d(h, grid, ty, th)
        for tx in range(grid):
            c0, c1 = _hat_1d(w, grid, tx, tw)
            t = ty * grid + tx
            sub = bins[r0:r1, c0:c1]
            bmin = jnp.min(sub)
            bmax = jnp.max(sub)
            base = cdf0_ref[0, t, bmin]              # == cdf[bmin - 1]

            def add_bin(b, acc, t=t, sub=sub):
                d = cdf0_ref[0, t, b + 1] - cdf0_ref[0, t, b]
                step = (sub >= b).astype(jnp.float32)
                return lax.cond(
                    jnp.logical_and(b >= bmin, b <= bmax),
                    lambda a: a + d * step, lambda a: a, acc)

            acc0 = jnp.full(sub.shape, base, jnp.float32)
            # telescoping step identity over the occupied span:
            # cdf[k] = cdf[bmin-1] + sum_{bmin <= b <= k} (cdf[b]-cdf[b-1])
            lut = lax.fori_loop(0, NBINS, add_bin, acc0)
            # hat weights rebuilt in-kernel from iota (pallas kernels
            # cannot capture array constants); r0/c0/th/tw/ty/tx are
            # trace-time python ints, so this folds to pure vector math
            # iota must be integer-typed on Mosaic TPU
            ri = lax.broadcasted_iota(
                jnp.int32, sub.shape, 0).astype(jnp.float32) + r0
            ci = lax.broadcasted_iota(
                jnp.int32, sub.shape, 1).astype(jnp.float32) + c0
            yy = jnp.clip((ri + 0.5) / th - 0.5, 0.0, grid - 1.0)
            xx = jnp.clip((ci + 0.5) / tw - 0.5, 0.0, grid - 1.0)
            wgt = (jnp.maximum(0.0, 1.0 - jnp.abs(yy - ty))
                   * jnp.maximum(0.0, 1.0 - jnp.abs(xx - tx)))
            out_ref[0, r0:r1, c0:c1] += wgt * lut


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def equalize_adapthist_batch(tiles: jnp.ndarray, clip_limit: float = 0.03,
                             grid: int = 8) -> jnp.ndarray:
    """Batched CLAHE, [B, H, W] f32 -> [B, H, W] in [0, 1].  Semantics of
    ops/clahe.equalize_adapthist, TPU-native lowering."""
    b, h, w = tiles.shape
    x = tiles.astype(jnp.float32)
    interpret = _use_interpret()

    vmin = jnp.min(x, axis=(1, 2))
    vmax = jnp.max(x, axis=(1, 2))
    span = jnp.where(vmax > vmin, vmax - vmin, 1.0)
    vlims = jnp.stack([vmin, span], axis=-1)[:, None, :]       # [B, 1, 2]

    th = -(-h // grid)
    tw = -(-w // grid)
    xp = jnp.pad(x, ((0, 0), (0, th * grid - h), (0, tw * grid - w)),
                 mode="reflect")
    # [B, grid, th, W]: the band axis is a leading block axis, so the
    # last two block dims equal the array dims (Mosaic requires blocks
    # 8/128-divisible OR full-dim; th is rarely 8-divisible)
    xp = xp.reshape(b, grid, th, tw * grid)

    hist = pl.pallas_call(
        functools.partial(_hist_kernel, grid=grid, th=th, tw=tw),
        grid=(b, grid),
        in_specs=[pl.BlockSpec((1, 1, th, tw * grid),
                               lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 2), lambda i, g: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, grid, NBINS),
                               lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, grid, grid, NBINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, vlims)

    # clip + iterative excess redistribution — the SAME helper as the
    # XLA formulation (ops/clahe.clip_redistribute), so the contrast
    # limiting cannot drift between the two parity-pinned paths
    from caesar_yolo_tpu.ops.clahe import clip_redistribute
    hist = clip_redistribute(hist.reshape(b, grid * grid, NBINS),
                             th * tw, clip_limit, NBINS)
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[:, :, -1:]
    cdf0 = jnp.pad(cdf, ((0, 0), (0, 0), (1, 0)))     # [B, g*g, NBINS+1]

    out = pl.pallas_call(
        functools.partial(_blend_kernel, grid=grid, th=th, tw=tw, h=h, w=w),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, grid * grid, NBINS + 1),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, vlims, cdf0)
    return out
