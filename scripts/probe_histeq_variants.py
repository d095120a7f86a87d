"""On-chip A/B probe of scatter-free hist-eq formulations.

Variant current: .at[].add scatter histogram + jnp.take LUT (round-2 fix;
  runs at 132px but pathological at 640px — compile/run exceeded 400 s).
Variant fused: histogram = fused one-hot compare-sum reduction;
  LUT apply = clipped-ramp weighted sum over normalized hist (exact
  algebraic identity with linear interp over the CDF at bin centers).

Usage: python scripts/probe_histeq_variants.py VARIANT SIZE BATCH [ITERS]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def equalize_fused(values, nbins=256):
    flat = values.reshape(-1).astype(jnp.float32)
    vmin = jnp.min(flat)
    vmax = jnp.max(flat)
    span = jnp.where(vmax > vmin, vmax - vmin, 1.0)
    scaled = (flat - vmin) / span * nbins
    bin_idx = jnp.clip(scaled.astype(jnp.int32), 0, nbins - 1)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    # histogram: fused compare-sum, no scatter
    hist = jnp.sum((bin_idx[:, None] == bins[None, :]).astype(jnp.float32),
                   axis=0)
    hn = hist / jnp.sum(hist)
    # LUT apply: out = (1-f)*cdf[i] + f*cdf[i+1]  ==  sum_b hn[b] *
    # clip(pos - b + 1, 0, 1)   (clipped-ramp identity, no gather)
    step = span / nbins
    c0 = vmin + 0.5 * step
    pos = jnp.clip((flat - c0) / step, 0.0, float(nbins - 1))
    w = jnp.clip(pos[:, None] - bins[None, :].astype(jnp.float32) + 1.0,
                 0.0, 1.0)
    out = jnp.sum(w * hn[None, :], axis=1)
    return out.reshape(values.shape)


def main():
    variant = sys.argv[1]
    size = int(sys.argv[2])
    batch = int(sys.argv[3])
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    if variant == "current":
        from caesar_yolo_tpu.ops.histeq import equalize_hist as eq
    else:
        eq = equalize_fused

    @jax.jit
    def loop(tiles):
        def body(_, x):
            out = jax.vmap(lambda im: eq(im[:, :, 0]))(x)
            dep = jnp.sum(out) * 0.0
            return x + dep.astype(x.dtype)
        return lax.fori_loop(0, iters, body, tiles)

    rng = np.random.default_rng(0)
    tiles = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, size, size, 1)).astype(np.float32)))

    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "variant": variant, "size": size, "batch": batch, "iters": iters,
        "compile_s": round(compile_s, 2),
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "imgs_per_sec": round(batch * iters / dt, 1),
    }))


if __name__ == "__main__":
    main()
