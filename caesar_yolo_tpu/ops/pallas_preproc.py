"""Pallas TPU kernels for the hot preprocessing path.

The README-default preprocessing (zscale stretch + min-max normalization,
reference test/run_inference.sh) as ONE VMEM-resident pass: each grid
step owns one tile, loads it into VMEM once (a full 640x640 f32 tile is
1.6 MB), computes the zscale stretch, reduces the masked min/max of the
stretched values in-register, applies the normalization, and writes the
result — one HBM read + one HBM write per tile, optionally casting to
the model compute dtype (bfloat16) on the way out.

STATUS: opt-in only (Pipeline.apply_batch(use_fused=True)), NOT the
default path.  Measured on v5e (in-graph interleaved A/B, batch 128 of
640x640): the plain vmapped XLA chain runs 1.91 ms standalone and
19.6 ms inside the full detect program, the Pallas kernel 2.87 / 20.4 ms
— XLA fuses the zscale->minmax->normalize chain (and its neighbors) by
itself, and the pallas_call is an opaque fusion barrier.  Kept as a
tested, bit-exact alternative and as the working example for the
repo's Pallas kernel pattern.

zscale interval limits (vmin, vmax) still come from the sampled line fit
in ops/zscale.py (1000 samples — negligible, measured +0.27 ms/batch-128
on v5e).

`fused_zscale_minmax(tiles, ...)` is numerically equivalent to
Pipeline([zscale_transformer, min_max_normalizer]) on single-channel
tiles (tests assert parity in interpret mode; bit-exact on real TPU vs
the vmapped XLA chain at f32).
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


def _fused_kernel(x_ref, vlim_ref, nlim_ref, out_ref, zlim_ref):
    """One-pass zscale + masked min/max + normalize for one tile."""
    i = pl.program_id(0)
    z = _zscale_apply(x_ref[:], vlim_ref[i, 0], vlim_ref[i, 1])
    valid = (z != 0) & jnp.isfinite(z)
    zmin = jnp.min(jnp.where(valid, z, jnp.inf))
    zmax = jnp.max(jnp.where(valid, z, -jnp.inf))
    zlim_ref[i, 0] = zmin
    zlim_ref[i, 1] = zmax
    zspan = zmax - zmin
    norm_min = nlim_ref[0, 0]
    norm_max = nlim_ref[0, 1]
    out = (z - zmin) / jnp.where(zspan != 0, zspan, 1.0) \
        * (norm_max - norm_min) + norm_min
    out_ref[:] = jnp.where(valid, out, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("contrast", "norm_min",
                                             "norm_max", "out_dtype"))
def fused_zscale_minmax(tiles: jnp.ndarray, contrast: float = 0.25,
                        norm_min: float = 0.0, norm_max: float = 1.0,
                        out_dtype=jnp.float32):
    """Fused zscale+minmax for [B, H, W] (or [B, H, W, 1]) f32 tiles.

    Returns (out, valid[B]) with the Pipeline masking semantics:
    valid=False when a tile has no nonzero pixels after zscale or a
    degenerate normalizer span.  `out_dtype` lets callers cast to the
    model compute dtype in-kernel (normalization math stays f32).
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
    nlim_spec = pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    nlims = jnp.asarray([[norm_min, norm_max]], jnp.float32)

    out, zlims = pl.pallas_call(
        _fused_kernel,
        grid=(b,),
        in_specs=[tile_spec, pair_spec, nlim_spec],
        out_specs=(tile_spec, pair_spec),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), out_dtype),
                   jax.ShapeDtypeStruct((b, 2), jnp.float32)),
        interpret=INTERPRET or jax.default_backend() == "cpu",
    )(tiles, vlims, nlims)

    valid = jnp.isfinite(zlims[:, 0]) & (zlims[:, 1] > zlims[:, 0])
    if squeeze:
        out = out[..., None]
    return out, valid
