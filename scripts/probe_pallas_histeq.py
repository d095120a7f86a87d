"""On-chip timing for the Pallas hist-eq kernels.

Usage: python scripts/probe_pallas_histeq.py SIZE BATCH {noise,radio} [ITERS]
  noise: Gaussian tiles (every band spans most bins — worst case)
  radio: Gaussian noise + bright sources (bands span few bins — realistic)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from caesar_yolo_tpu.cli.run import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.ops.pallas_histeq import equalize_hist_batch


def main():
    size = int(sys.argv[1])
    batch = int(sys.argv[2])
    kind = sys.argv[3]
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, size, size)).astype(np.float32)
    if kind == "radio":
        for i in range(batch):
            cy, cx = rng.integers(20, size - 20, 2)
            x[i, cy - 3:cy + 3, cx - 3:cx + 3] += 200.0

    @jax.jit
    def loop(tiles):
        def body(_, t):
            out = equalize_hist_batch(t)
            return t + jnp.sum(out) * 0.0
        return lax.fori_loop(0, iters, body, tiles)

    tiles = jax.device_put(jnp.asarray(x))
    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "kind": kind, "size": size, "batch": batch, "iters": iters,
        "compile_s": round(compile_s, 2),
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "imgs_per_sec": round(batch * iters / dt, 1),
    }))


if __name__ == "__main__":
    main()
