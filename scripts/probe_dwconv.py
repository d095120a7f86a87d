"""Depthwise-conv formulation probe (yolo11 detect-head cls branch).

The yolo11 head's cls branch opens each level with a 3x3 DWConv
(models/yolo.py:102-106, mirroring ultralytics' v11 head); the head
region measured 46.7% of bf16 peak in the note-9 attribution.  Depthwise
convs give the MXU one input channel per group, so XLA's grouped
conv_general_dilated lowering may be the head's soft spot.  This probe
A/Bs, at the three yolo11l head shapes (B=128):

  grouped   lax.conv_general_dilated with feature_group_count=C
            (the shipped formulation, models/layers.py:_conv2d)
  shift9    sum of 9 pad-and-slice shifted elementwise products — pure
            VPU/bandwidth work, no conv op at all
  pallas    VMEM-resident per-image plane: one HBM read of x, 9
            static-shift MACs (concat-based shifts) on the VPU, one
            HBM write — the read+write bandwidth floor formulation

VERDICT (measured on the real chip 2026-08-19, both runs): grouped
WINS at every head shape —

  shape               grouped   shift9   pallas
  [128, 80, 80, 256]  4.86 ms   10.42    9.11
  [128, 40, 40, 512]  2.94      5.55     5.04
  [128, 20, 20, 512]  1.05      1.75     2.20

XLA's grouped conv sits ~4.7x above the HBM read+write floor
(98-173 GB/s), but both VPU reformulations are relayout-bound: the
W-axis shifts are sublane-dim concats that Mosaic materializes as
full-plane relayouts per tap (the same pathology the single-pass
Pallas upsample hit, STATUS note 10).  REJECTED — models/layers.py
keeps lax.conv_general_dilated with feature_group_count=C.

Method per STATUS note 1: isolated timings on this relay-backed chip are
only meaningful as in-graph chained loops; this probe runs each
formulation in its own fori_loop program and checks parity first.
Run on the TPU: python scripts/probe_dwconv.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_TINY") == "1":
    # the CPU parity smoke must NOT touch the (possibly busy) TPU; the
    # sitecustomize hook overrides JAX_PLATFORMS, so force it here
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax


def dw_grouped(x, w):
    """Shipped formulation: grouped conv (w: [3, 3, 1, C])."""
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32)


def _dw_kernel(x_ref, w_ref, o_ref):
    """Per-image [H, W, C] plane resident in VMEM; 3x3 depthwise conv as
    9 shifted multiply-accumulates.  Shifts along H are address offsets
    (outer dim); shifts along W are sublane-dim concats."""
    x = x_ref[0]                                       # [H, W, C]
    h, wd, c = x.shape
    wt = w_ref[...].astype(jnp.float32)                # [3, 3, 1, C]

    def shift(a, dy, dx):
        if dy == 1:
            a = jnp.concatenate(
                [a[1:], jnp.zeros((1, wd, c), a.dtype)], axis=0)
        elif dy == -1:
            a = jnp.concatenate(
                [jnp.zeros((1, wd, c), a.dtype), a[:-1]], axis=0)
        if dx == 1:
            a = jnp.concatenate(
                [a[:, 1:], jnp.zeros((h, 1, c), a.dtype)], axis=1)
        elif dx == -1:
            a = jnp.concatenate(
                [jnp.zeros((h, 1, c), a.dtype), a[:, :-1]], axis=1)
        return a

    acc = x.astype(jnp.float32) * wt[1, 1, 0]
    for ky in range(3):
        for kx in range(3):
            if ky == 1 and kx == 1:
                continue
            acc = acc + (shift(x, ky - 1, kx - 1).astype(jnp.float32)
                         * wt[ky, kx, 0])
    o_ref[0] = acc


def dw_pallas(x, w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, h, wd, c = x.shape
    return pl.pallas_call(
        _dw_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 1, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=os.environ.get("PROBE_TINY") == "1",
    )(x, w)


def dw_shift9(x, w):
    """9 shifted elementwise products over a zero-padded copy."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, c), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc = acc + (xp[:, ky:ky + h, kx:kx + wd, :].astype(jnp.float32)
                         * w[ky, kx, 0, :].astype(jnp.float32))
    return acc


def main():
    # yolo11l head input shapes (chs=(256, 512, 512) at strides 8/16/32);
    # PROBE_TINY=1 shrinks for a CPU parity smoke
    if os.environ.get("PROBE_TINY") == "1":
        shapes, iters = [(2, 16, 16, 8)], 2
    else:
        shapes = [(128, 80, 80, 256), (128, 40, 40, 512), (128, 20, 20, 512)]
        iters = 30
    rng = np.random.default_rng(0)

    for shape in shapes:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, shape[-1]))
                        .astype(np.float32)).astype(jnp.bfloat16)

        ref = np.asarray(dw_grouped(x, w), np.float32)
        alt = np.asarray(dw_shift9(x, w), np.float32)
        alt2 = np.asarray(dw_pallas(x, w), np.float32)
        maxdiff = max(float(np.max(np.abs(ref - alt))),
                      float(np.max(np.abs(ref - alt2))))
        scale = float(np.max(np.abs(ref))) or 1.0

        results = {}
        for name, fn in (("grouped", dw_grouped), ("shift9", dw_shift9),
                         ("pallas", dw_pallas)):
            @jax.jit
            def loop(x, w, fn=fn):
                def body(_, acc):
                    y = fn(acc.astype(jnp.bfloat16), w)
                    dep = jnp.sum(y) * 0.0
                    return acc + dep.astype(acc.dtype)
                return lax.fori_loop(0, iters, body, x.astype(jnp.float32))

            out = loop(x, w)
            _ = np.asarray(out[0, 0, 0, 0])
            t0 = time.perf_counter()
            out = loop(x, w)
            _ = np.asarray(out[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / iters
            results[name] = dt * 1e3

        b, h, wd, c = shape
        traffic = 2 * b * h * wd * c * 2  # read+write bf16 bytes
        print(f"[{shape}] reldiff={maxdiff / scale:.2e}")
        for name, ms in results.items():
            gbs = traffic / (ms / 1e3) / 1e9
            print(f"   {name:9s} {ms:8.3f} ms/batch  {gbs:6.0f} GB/s "
                  f"(read+write floor)")


if __name__ == "__main__":
    main()
