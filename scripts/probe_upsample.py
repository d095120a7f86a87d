"""On-chip A/B probe: 2x nearest upsample formulations.

Target: yolo11l/v8l neck upsamples (models/layers.py Upsample) — the
round-3 attribution measured up1+up2 at 6.2 ms/batch-128 for ZERO FLOPs
(~4x their HBM bandwidth floor: up2 moves ~0.8 GB at [128,40,40,256]
->80x80 bf16).  jnp.repeat along two axes materializes an intermediate
and lowers to gathers on some backends; candidates:

  repeat     x.repeat(2, axis=1).repeat(2, axis=2)          (current)
  broadcast  x[:,:,None,:,None,:] -> broadcast -> reshape   (pure layout)
  einsum     y = R x R^T with 0/1 replication matrices      (rides MXU)

All bit-exact vs repeat.  Decision data for models/layers.Upsample
(STATUS note-3 methodology).

Usage: python scripts/probe_upsample.py [B C1 H1 C2 H2 iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
C1 = int(sys.argv[2]) if len(sys.argv) > 2 else 512
H1 = int(sys.argv[3]) if len(sys.argv) > 3 else 20
C2 = int(sys.argv[4]) if len(sys.argv) > 4 else 256
H2 = int(sys.argv[5]) if len(sys.argv) > 5 else 40
ITERS = int(sys.argv[6]) if len(sys.argv) > 6 else 30


def up_repeat(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def up_broadcast(x):
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


def _rep_matrix(h, dtype):
    # [h, 2h] with R[i, 2i] = R[i, 2i+1] = 1
    eye = jnp.eye(h, dtype=dtype)
    return jnp.repeat(eye, 2, axis=1)


def up_einsum(x):
    b, h, w, c = x.shape
    rh = _rep_matrix(h, x.dtype)
    rw = _rep_matrix(w, x.dtype)
    y = jnp.einsum("bhwc,hH->bHwc", x, rh,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bhwc,wW->bhWc", y, rw,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _up_kernel_bcast(x_ref, o_ref):
    # one (batch, H-block) tile: [1, BH, W, C] -> [1, 2*BH, 2W, C]
    x = x_ref[0]                                    # [BH, W, C]
    bh, w, c = x.shape
    y = jnp.broadcast_to(x[:, None, :, None, :], (bh, 2, w, 2, c))
    o_ref[0] = y.reshape(2 * bh, 2 * w, c)


def _up_kernel_rows(x_ref, o_ref):
    # per-row static loop; W doubled via (W,2,C) broadcast+reshape
    x = x_ref[0]
    bh, w, c = x.shape
    for i in range(bh):
        row = x[i]                                  # [W, C]
        wide = jnp.broadcast_to(row[:, None, :], (w, 2, c))
        wide = wide.reshape(2 * w, c)
        o_ref[0, 2 * i] = wide
        o_ref[0, 2 * i + 1] = wide


def _make_pallas_up(kernel, bh=None):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def up(x, interpret=False):
        b, h, w, c = x.shape
        blk = bh or h
        spec_in = pl.BlockSpec((1, blk, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, 2 * blk, 2 * w, c),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(b, h // blk),
            in_specs=[spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x)

    return up


def up_pallas_bcast(x):
    return _make_pallas_up(_up_kernel_bcast)(x)


def up_pallas_rows(x):
    return _make_pallas_up(_up_kernel_rows)(x)


def up_pallas_rows4(x):
    return _make_pallas_up(_up_kernel_rows, bh=4)(x)


VARIANTS = {"repeat": up_repeat, "broadcast": up_broadcast,
            "einsum": up_einsum, "pl_bcast": up_pallas_bcast,
            "pl_rows": up_pallas_rows, "pl_rows4": up_pallas_rows4}


def time_loop(fn, x):
    @jax.jit
    def loop(x):
        def body(_, x):
            y = fn(x)
            # every stride-2 slice of a 2x nearest upsample is the
            # input itself, so any cheap dependency is algebraically
            # foldable — the barrier forces y's materialization (the
            # Pallas variant is opaque anyway; without this the XLA
            # variants could be dead-coded and time near zero)
            y = jax.lax.optimization_barrier(y)
            dep = (jnp.sum(y[:, ::2, ::2, :]) * 1e-30).astype(x.dtype)
            return x + dep
        return lax.fori_loop(0, ITERS, body, x)

    out = loop(x)
    _ = np.asarray(out[0, 0, 0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x)
        _ = np.asarray(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    for name, (c, h) in (("up1", (C1, H1)), ("up2", (C2, H2))):
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((B, h, h, c)), jnp.bfloat16))
        ref = np.asarray(jax.jit(up_repeat)(x), np.float32)
        gb = (x.size + 4 * x.size) * 2 / 1e9
        print(f"-- {name}: [{B},{h},{h},{c}] -> {2*h}x{2*h} "
              f"({gb:.2f} GB traffic floor)")
        for vname, fn in VARIANTS.items():
            try:
                got = np.asarray(jax.jit(fn)(x), np.float32)
                err = np.abs(ref - got).max()
                ms = time_loop(fn, x)
            except Exception as e:
                print(f"   {vname:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                continue
            print(f"   {vname:10s} {ms:7.3f} ms/batch  "
                  f"{gb / ms * 1e3:6.0f} GB/s  maxdiff={err:.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
