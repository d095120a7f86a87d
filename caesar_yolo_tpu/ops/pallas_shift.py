"""Pallas TPU kernel: per-row fractional lane shift (the shear pass of
the augmentation resampler).

A shear maps out[y, x] = in[y, x + s_y] with a row-constant fractional
shift s_y.  Every XLA formulation of this is a gather, and arbitrary
gathers are catastrophic on TPU (measured for the [16, 1092, 1092, 3]
augmentation canvas: 4-neighbor 2D gather 269 ms/batch, vmapped
dynamic_slice 130 ms/pass, explicit row-slice lax.gather 66 ms/pass).
In VMEM the same operation is two circular lane rotates + a lerp per
row, which runs at HBM speed.

Layout: channels are flattened into lanes ([H, W, C] -> [H, W*C]), so a
shift of k pixels is a roll of C*k lanes; rows are pre-padded with
`pad` pixels on both sides so the roll's circular wrap never reaches
the output window (requires pad >= max|shift| + 1).  The batch
dimension is a grid axis (NOT jax.vmap — Mosaic rejects the batched
SMEM blocks vmap produces).  Dynamic roll amounts are normalized to
[0, lanes): negative dynamic shifts mis-lower on real v5e hardware
(verified; interpret mode accepts them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU

_BH = 8  # rows per grid step (f32 sublane tile)


def _shift_kernel(out_w, c, pad, k_ref, f_ref, x_ref, o_ref):
    """x_ref [BH, lanes_pad] (one row-block of one image);
    k_ref/f_ref [B, H_pad] full in SMEM; o_ref [BH, out_w * c]."""
    lo = pad * c
    lanes = x_ref.shape[-1]
    b = pl.program_id(0)
    base = pl.program_id(1) * _BH
    for i in range(_BH):
        k = k_ref[b, base + i]
        f = f_ref[b, base + i]
        row = x_ref[0, i:i + 1, :]
        a0 = pltpu.roll(row, (-c * k) % lanes, axis=1)
        a1 = pltpu.roll(row, (-c * (k + 1)) % lanes, axis=1)
        out = a0 * (1.0 - f) + a1 * f
        o_ref[0, i:i + 1, :] = out[:, lo:lo + out_w * c]


@functools.partial(jax.jit, static_argnames=("pad",))
def fractional_row_shift_batch(imgs: jnp.ndarray, shifts: jnp.ndarray,
                               pad: int,
                               pad_val: float = 0.0) -> jnp.ndarray:
    """out[b, y, x] = imgs[b, y, x + shifts[b, y]] bilinearly.

    imgs [B, H, W, C] f32; shifts [B, H]; `pad` must exceed
    max(|shifts|) + 1; out-of-frame samples read `pad_val`.  Exact vs
    the dynamic_slice formulation (tests/test_pallas_shift.py).
    """
    b, h, w, c = imgs.shape
    k0 = jnp.floor(shifts).astype(jnp.int32)
    f = (shifts - jnp.floor(shifts)).astype(jnp.float32)
    k0 = jnp.clip(k0, -pad, pad - 1)

    hp = -(-h // _BH) * _BH
    padded = jnp.pad(imgs, ((0, 0), (0, hp - h), (pad, pad), (0, 0)),
                     constant_values=pad_val)
    lanes = (w + 2 * pad) * c
    lanes_pad = -(-lanes // 128) * 128
    flat = padded.reshape(b, hp, lanes)
    if lanes_pad != lanes:
        # extra right padding only widens the pad region (the output
        # window plus max roll never reaches it); aligns the lane count
        # for pltpu.roll
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, lanes_pad - lanes)),
                       constant_values=pad_val)
    k0 = jnp.pad(k0, ((0, 0), (0, hp - h)))
    f = jnp.pad(f, ((0, 0), (0, hp - h)))

    out = pl.pallas_call(
        functools.partial(_shift_kernel, w, c, pad),
        grid=(b, hp // _BH),
        in_specs=[
            pl.BlockSpec((b, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _BH, lanes_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BH, w * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w * c), jnp.float32),
        interpret=INTERPRET,
    )(k0, f, flat)
    return out[:, :h].reshape(b, h, w, c)


def fractional_row_shift(img: jnp.ndarray, shifts: jnp.ndarray,
                         pad: int, pad_val: float = 0.0) -> jnp.ndarray:
    """Single-image variant: [H, W, C] -> [H, W, C]."""
    return fractional_row_shift_batch(img[None], shifts[None], pad,
                                      pad_val)[0]
