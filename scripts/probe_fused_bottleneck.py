"""On-chip A/B probe: fused Pallas bottleneck chain vs XLA convs.

Target: the yolo11l c3k2_1 inner chains — Bottleneck(32, 32, k=3x3)
pairs at 160x160 spatial, the lane-starved stage the round-3 attribution
measured at 25% of bf16 peak (23.4 ms of the 122 ms batch;
scripts/flops_attrib.py).  Hypothesis: XLA sits ~8 ms above the
N=32-starved compute ceiling because every intermediate makes an HBM
round trip; a whole-image VMEM-resident kernel (im2col by 9 static
shifts -> one K=9C matmul per conv, silu + residual in-register)
removes that traffic.

Measures both formulations in-graph (chained fori_loop) and checks
numeric agreement.  Decision data for integrating a fused C3k2/C2f
chain or rejecting it with numbers (STATUS note-3 methodology).

Usage: python scripts/probe_fused_bottleneck.py [B H W C nblocks iters]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = int(sys.argv[2]) if len(sys.argv) > 2 else 160
W = int(sys.argv[3]) if len(sys.argv) > 3 else 160
C = int(sys.argv[4]) if len(sys.argv) > 4 else 32
NB = int(sys.argv[5]) if len(sys.argv) > 5 else 2   # bottleneck pairs
ITERS = int(sys.argv[6]) if len(sys.argv) > 6 else 20
NCONV = 2 * NB


def silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------- XLA reference: chained convs --------------------------

def conv3x3(x, w, b):
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return silu(y + b).astype(x.dtype)


def xla_chain(x, ws, bs):
    for i in range(NB):
        y = conv3x3(x, ws[2 * i], bs[2 * i])
        y = conv3x3(y, ws[2 * i + 1], bs[2 * i + 1])
        x = x + y
    return x


# ---------------- Pallas fused whole-image chain ------------------------

STRIP = 32  # output rows per inner step; bounds live f32 to ~7 MB


def _chain_kernel(x_ref, w_ref, b_ref, out_ref, *, h, w, c, nb):
    """Scatter formulation: one [rows*W, C] @ [C, 9C] matmul computes all
    9 taps' contributions (N=288 keeps the MXU busier than N=32), then 9
    statically-shifted f32 accumulates realize the stencil on the OUTPUT
    side: out[r,s] = sum_t y[r+di-1, s+dj-1, t-th block].  Mosaic cannot
    lane-concat shifted slices (im2col), and a whole-image [H,W,9C] f32
    intermediate spills VMEM (measured: 119 MB register spills at
    160x160x32), so each conv runs strip-by-strip over rows with a 1-row
    halo; intermediate images stay bf16."""
    x = x_ref[0]                                        # [H, W, C]

    def conv(x, i):
        strips = []
        for r0 in range(0, h, STRIP):
            r1 = min(r0 + STRIP, h)
            lo, hi = max(r0 - 1, 0), min(r1 + 1, h)
            y2d = jax.lax.dot_general(
                x[lo:hi].reshape((hi - lo) * w, c), w_ref[i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [rows*W, 9C]
            y = y2d.reshape(hi - lo, w, 9 * c)
            ypad = jnp.pad(y, ((0 if r0 else 1, 1 if r1 == h else 0),
                               (1, 1), (0, 0)))
            # ypad row 0 == image row r0-1; col 0 == image col -1
            acc = jnp.zeros((r1 - r0, w, c), jnp.float32)
            for t in range(9):
                di, dj = t // 3, t % 3
                acc = acc + ypad[di:di + (r1 - r0), dj:dj + w,
                                 t * c:(t + 1) * c]
            strips.append(silu(acc + b_ref[i]).astype(x.dtype))
        return jnp.concatenate(strips, axis=0)

    for i in range(nb):
        y = conv(x, 2 * i)
        y = conv(y, 2 * i + 1)
        x = x + y
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=())
def pallas_chain(x, wmat, bmat):
    b, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_chain_kernel, h=h, w=w, c=c, nb=NB),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCONV, c, 9 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCONV, 1, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, wmat, bmat)


def time_loop(fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, x):
            y = fn(x, *a[1:])
            return x + (jnp.sum(y) * 1e-30).astype(x.dtype)
        return lax.fori_loop(0, ITERS, body, a[0])

    out = loop(*args)
    _ = np.asarray(out[0, 0, 0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        _ = np.asarray(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, C)) * 0.5, jnp.bfloat16))
    ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * (0.2 / C ** 0.5),
                      jnp.bfloat16) for _ in range(NCONV)]
    bs = [jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.bfloat16)
          for _ in range(NCONV)]
    # scatter weight layout: [ci, t*C + co], taps (di, dj) row-major
    wmat = jnp.stack([w.transpose(2, 0, 1, 3).reshape(C, 9 * C)
                      for w in ws])
    bmat = jnp.stack([b.reshape(1, C) for b in bs])

    ref = np.asarray(xla_chain(x, ws, bs), np.float32)
    got = np.asarray(pallas_chain(x, wmat, bmat), np.float32)
    err = np.abs(ref - got).max()
    print(f"maxdiff xla vs pallas: {err:.5f} (bf16 chain)")

    gflop = 2 * H * W * 9 * C * C * NCONV / 1e9
    ms_x = time_loop(xla_chain, x, ws, bs)
    print(f"XLA    {ms_x:7.2f} ms/batch  "
          f"{B * gflop / ms_x / 1e3:6.1f} TFLOP/s")
    ms_p = time_loop(pallas_chain, x, wmat, bmat)
    print(f"Pallas {ms_p:7.2f} ms/batch  "
          f"{B * gflop / ms_p / 1e3:6.1f} TFLOP/s")
    print(f"speedup: {ms_x / ms_p:.2f}x")


if __name__ == "__main__":
    main()
