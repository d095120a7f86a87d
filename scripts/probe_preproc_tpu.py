"""On-chip probe for the astronomy preprocessing transforms.

Round-2 found that hist-eq (jnp.interp's searchsorted lowering) HUNG the
TPU worker; the fix (direct bin lookup, commit 6d14b3b) was verified
numerically only.  This probe executes each risky transform on the real
chip in an escalating, subprocess-guarded way (drive it under `timeout`)
and prints one JSON line with the measured in-graph time.

Usage:  python scripts/probe_preproc_tpu.py MODE SIZE BATCH [ITERS]
  MODE in {histeq, clahe, chan3, bkgsub, full}
  full = sigma-clip bkg subtract + chan3 + minmax (BASELINE config[1]).

Measurement follows bench.py: the whole iteration chain runs inside ONE
compiled lax.fori_loop with a zero-scaled dependency threading iterations,
so the ~6.5 ms relay dispatch floor is paid once.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(mode):
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.ops.transforms import Pipeline, hist_equalizer
    if mode == "histeq":
        return Pipeline([hist_equalizer()])
    if mode == "clahe":
        return Pipeline([hist_equalizer(adaptive=True)])
    if mode == "chan3":
        return build_preprocessor(chan3_preproc=True)
    if mode == "bkgsub":
        return build_preprocessor(subtract_bkg=True)
    if mode == "full":
        return build_preprocessor(subtract_bkg=True, chan3_preproc=True,
                                  normalize_minmax=True)
    raise SystemExit(f"unknown mode {mode}")


def main():
    mode = sys.argv[1]
    size = int(sys.argv[2])
    batch = int(sys.argv[3])
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax
    import jax.numpy as jnp
    from jax import lax

    pipe = build(mode)

    @jax.jit
    def loop(tiles):
        def body(_, x):
            out, ok = pipe.apply_batch(x)
            dep = (jnp.sum(out) + jnp.sum(ok.astype(jnp.float32))) * 0.0
            return x + dep.astype(x.dtype)
        return lax.fori_loop(0, iters, body, tiles)

    rng = np.random.default_rng(0)
    data = rng.standard_normal((batch, size, size, 1)).astype(np.float32)
    # realistic radio stats: positive sources on noise, some zeros (masked)
    data[:, :4, :4, :] = 0.0
    tiles = jax.device_put(jnp.asarray(data))

    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = loop(tiles)
    _ = np.asarray(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    per_img_ms = dt / (batch * iters) * 1e3
    print(json.dumps({
        "mode": mode, "size": size, "batch": batch, "iters": iters,
        "compile_s": round(compile_s, 2),
        "total_s": round(dt, 4),
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "imgs_per_sec": round(batch * iters / dt, 1),
        "ms_per_img": round(per_img_ms, 4),
    }))


if __name__ == "__main__":
    main()
