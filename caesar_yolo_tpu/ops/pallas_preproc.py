"""Pallas TPU kernels for the hot preprocessing path.

The README-default preprocessing (zscale stretch + min-max normalization,
reference test/run_inference.sh) costs several full-image HBM round trips
when expressed as separate XLA ops: the zscale transform pass, the masked
min/max reduction of its output, and the normalize pass.  These kernels
fuse the work into two VMEM-resident passes per tile:

  pass 1 (stats):  z = clip((x - vmin)/span, 0, 1) computed on the fly;
                   masked min/max of z (mask = z != 0 & finite) reduced in
                   VMEM; only 2 scalars per tile reach HBM.
  pass 2 (apply):  recompute z, apply (z - zmin)/(zmax - zmin), restore
                   masked pixels to 0 — one read + one write.

zscale interval limits (vmin, vmax) still come from the sampled line fit
in ops/zscale.py (1000 samples — negligible).  Each grid step owns one
tile; a full 640x640 f32 tile is 1.6 MB, comfortably inside VMEM.

`fused_zscale_minmax(tiles, ...)` is numerically equivalent to
Pipeline([zscale_transformer, min_max_normalizer]) on single-channel
tiles (tests assert parity in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caesar_yolo_tpu.ops.zscale import zscale_limits

INTERPRET = False  # tests flip this on CPU


def _zscale_apply(x, vmin, vmax):
    span = vmax - vmin
    z = jnp.where(span != 0, (x - vmin) / jnp.where(span != 0, span, 1.0),
                  x - vmin)
    z = jnp.clip(z, 0.0, 1.0)
    valid_in = (x != 0) & jnp.isfinite(x)
    return jnp.where(valid_in, z, 0.0)


def _stats_kernel(x_ref, vlim_ref, zlim_ref):
    i = pl.program_id(0)
    z = _zscale_apply(x_ref[:], vlim_ref[i, 0], vlim_ref[i, 1])
    valid = (z != 0) & jnp.isfinite(z)
    zlim_ref[i, 0] = jnp.min(jnp.where(valid, z, jnp.inf))
    zlim_ref[i, 1] = jnp.max(jnp.where(valid, z, -jnp.inf))


def _apply_kernel(x_ref, vlim_ref, zlim_ref, nlim_ref, out_ref):
    i = pl.program_id(0)
    z = _zscale_apply(x_ref[:], vlim_ref[i, 0], vlim_ref[i, 1])
    valid = (z != 0) & jnp.isfinite(z)
    zmin = zlim_ref[i, 0]
    zspan = zlim_ref[i, 1] - zmin
    norm_min = nlim_ref[0, 0]
    norm_max = nlim_ref[0, 1]
    out = (z - zmin) / jnp.where(zspan != 0, zspan, 1.0) \
        * (norm_max - norm_min) + norm_min
    out_ref[:] = jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("contrast", "norm_min",
                                             "norm_max"))
def fused_zscale_minmax(tiles: jnp.ndarray, contrast: float = 0.25,
                        norm_min: float = 0.0, norm_max: float = 1.0):
    """Fused zscale+minmax for [B, H, W] (or [B, H, W, 1]) f32 tiles.

    Returns (out, valid[B]) with the Pipeline masking semantics:
    valid=False when a tile has no nonzero pixels after zscale or a
    degenerate normalizer span.
    """
    squeeze = tiles.ndim == 4
    if squeeze:
        assert tiles.shape[-1] == 1
        tiles = tiles[..., 0]
    b, h, w = tiles.shape
    tiles = tiles.astype(jnp.float32)

    vmin, vmax = jax.vmap(lambda t: zscale_limits(t, contrast=contrast))(
        tiles)
    vlims = jnp.stack([vmin, vmax], axis=-1)          # [B, 2]

    tile_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # per-tile scalars live as FULL [b, 2] arrays in SMEM (TPU lowering
    # requires block dims divisible by the hardware tile or equal to the
    # array dims); kernels index their row with program_id
    pair_spec = pl.BlockSpec((b, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)

    zlims = pl.pallas_call(
        _stats_kernel,
        grid=(b,),
        in_specs=[tile_spec, pair_spec],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.float32),
        interpret=INTERPRET,
    )(tiles, vlims)

    nlims = jnp.asarray([[norm_min, norm_max]], jnp.float32)
    nlim_spec = pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _apply_kernel,
        grid=(b,),
        in_specs=[tile_spec, pair_spec, pair_spec, nlim_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=INTERPRET,
    )(tiles, vlims, zlims, nlims)

    valid = jnp.isfinite(zlims[:, 0]) & (zlims[:, 1] > zlims[:, 0])
    if squeeze:
        out = out[..., None]
    return out, valid
