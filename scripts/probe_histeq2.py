"""Isolate what's slow in hist-eq on the axon TPU backend.

Probes a single jitted program (no fori_loop chain) per run, with the
persistent compile cache on, and times compile vs execute separately.

Usage: python scripts/probe_histeq2.py VARIANT SIZE BATCH
  VARIANT in {hist_only, lut_only, both, both_novmap}
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

NBINS = 256


def hist_of(flat):
    vmin = jnp.min(flat)
    vmax = jnp.max(flat)
    span = jnp.where(vmax > vmin, vmax - vmin, 1.0)
    scaled = (flat - vmin) / span * NBINS
    bin_idx = jnp.clip(scaled.astype(jnp.int32), 0, NBINS - 1)
    bins = jnp.arange(NBINS, dtype=jnp.int32)
    hist = jnp.sum((bin_idx[:, None] == bins[None, :]).astype(jnp.float32),
                   axis=0)
    return hist, vmin, span


def lut_apply(flat, hn, vmin, span):
    bins = jnp.arange(NBINS, dtype=jnp.float32)
    step = span / NBINS
    c0 = vmin + 0.5 * step
    pos = jnp.clip((flat - c0) / step, 0.0, float(NBINS - 1))
    w = jnp.clip(pos[:, None] - bins[None, :] + 1.0, 0.0, 1.0)
    return jnp.sum(w * hn[None, :], axis=1)


def main():
    variant = sys.argv[1]
    size = int(sys.argv[2])
    batch = int(sys.argv[3])

    def one(img):
        flat = img.reshape(-1)
        if variant == "hist_only":
            h, vmin, span = hist_of(flat)
            return jnp.sum(h) + vmin + span
        if variant == "lut_only":
            # fixed fake histogram: isolates the LUT pass
            hn = jnp.full((NBINS,), 1.0 / NBINS)
            out = lut_apply(flat, hn, jnp.float32(0.0), jnp.float32(1.0))
            return jnp.sum(out)
        h, vmin, span = hist_of(flat)
        hn = h / jnp.sum(h)
        out = lut_apply(flat, hn, vmin, span)
        return jnp.sum(out)

    if variant == "both_novmap":
        variant = "both"

        @jax.jit
        def run(x):
            return one(x.reshape(-1))
    else:
        @jax.jit
        def run(x):
            return jnp.sum(jax.vmap(one)(x))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, size, size)).astype(np.float32)))

    t0 = time.perf_counter()
    r = run(x)
    _ = float(np.asarray(r))
    compile_s = time.perf_counter() - t0

    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        r = run(x)
        _ = float(np.asarray(r))
        times.append(time.perf_counter() - t0)

    print(json.dumps({
        "variant": sys.argv[1], "size": size, "batch": batch,
        "compile_s": round(compile_s, 2),
        "best_ms": round(min(times) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
