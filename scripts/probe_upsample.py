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


VARIANTS = {"repeat": up_repeat, "broadcast": up_broadcast,
            "einsum": up_einsum}


def time_loop(fn, x):
    @jax.jit
    def loop(x):
        def body(_, x):
            y = fn(x)
            # fold back to input shape so the chain stays live
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
            got = np.asarray(jax.jit(fn)(x), np.float32)
            err = np.abs(ref - got).max()
            ms = time_loop(fn, x)
            print(f"   {vname:10s} {ms:7.3f} ms/batch  "
                  f"{gb / ms * 1e3:6.0f} GB/s  maxdiff={err:.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
