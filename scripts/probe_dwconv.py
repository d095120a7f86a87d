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
  unrolled  9 separate w[ky,kx] * dynamic-slice terms accumulated in f32

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
        maxdiff = float(np.max(np.abs(ref - alt)))
        scale = float(np.max(np.abs(ref))) or 1.0

        results = {}
        for name, fn in (("grouped", dw_grouped), ("shift9", dw_shift9)):
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
