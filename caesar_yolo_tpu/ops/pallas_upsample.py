"""Pallas TPU kernel: single-pass 2x nearest-neighbor upsample (NHWC).

The yolo neck's two zero-FLOP upsamples measured 6.2 ms/batch-128 at
l-scale — ~4x their HBM bandwidth floor — because XLA lowers
`repeat(repeat(x, 2, 1), 2, 2)` as two materialized passes (read 1x +
write 2x + read 2x + write 4x = 9 traffic units vs the 5-unit floor of
read-once/write-once).  This kernel replicates in VMEM registers and
touches HBM once each way.

Formulation: one (batch, H-block) grid step loads [BH, W, C], builds
the 2x2 replication via broadcast+reshape in registers, and stores
[2*BH, 2W, C].  Bit-exact vs jnp.repeat (pure data movement).

Adoption is measurement-gated (models/layers.Upsample honors
CY_UPSAMPLE / set_upsample_mode): scripts/probe_upsample.py carries the
standalone A/B, and the full-model in-graph delta decides (STATUS
note-1 methodology).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU


def _use_interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"


def _up2_kernel(x_ref, o_ref):
    x = x_ref[0]                                       # [BH, W, C]
    bh, w, c = x.shape
    y = jnp.broadcast_to(x[:, None, :, None, :], (bh, 2, w, 2, c))
    o_ref[0] = y.reshape(2 * bh, 2 * w, c)


def supported(h: int, w: int, c: int) -> bool:
    """Mosaic wants the (sublane, lane) dims tileable: C must be
    128-aligned (neck channels are 128..512 at the scales that matter)
    and the full-image block must fit VMEM comfortably.  Only the TPU
    backend lowers the kernel (INTERPRET is for parity tests)."""
    from caesar_yolo_tpu.utils import portable
    in_bytes = h * w * c * 2   # bf16 worst case per batch element
    shape_ok = c % 128 == 0 and in_bytes * 5 <= 48 * 1024 * 1024
    backend_ok = (jax.default_backend() in ("tpu", "axon") or INTERPRET)
    return shape_ok and backend_ok and not portable.FORCE


@jax.jit
def upsample2x_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C], nearest (pixel replication)."""
    b, h, w, c = x.shape
    spec_in = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _up2_kernel,
        grid=(b,),
        in_specs=[spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x)
