"""NMS compact-stage formulation probe (follow-up to probe_slack_r5's
split: top-k selection 1.74 / suppression 0.47 / compact 0.95 ms at
B=128, K=512, max_det=300 — compact is the second-largest NMS cost).

Three exact-equivalent formulations of "move kept rows, score-order
preserved, to the front of a fixed [max_det] buffer":

  scatter4  — the shipped one: rank = cumsum(alive)-1, four separate
              .at[dst].set scatters (boxes/conf/cls/valid).
  scatter1  — same indices, ONE scatter of a packed [K, 8] f32 row
              (4 box + conf + cls + valid + pad), unpacked after.
  argsort   — stable argsort of ~alive (kept rows keep score order),
              gather the first max_det rows, mask validity by rank.

All three are bit-identical on the parity check below (cls < 2^24 so
the f32 round-trip in scatter1 is exact).  Timing: chained fori_loop
with a denormal dep, one-element device-indexed pull (the
probe_slack_r5 methodology — see its docstring for the three broken
ways measured first).

Usage: python scripts/probe_compact_r5.py [batch=128] [iters=50]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.detect import nms as nms_mod

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
K, MAXDET = 512, 300


def _mode_fn(mode):
    def fn(top_boxes, top_conf, top_cls, alive, max_det):
        prev = nms_mod._COMPACT_MODE
        nms_mod.set_compact_mode(mode)
        try:
            return nms_mod._compact(top_boxes, top_conf, top_cls, alive,
                                    max_det)
        finally:
            nms_mod._COMPACT_MODE = prev
    return fn


_compact = _mode_fn("scatter4")
compact_scatter1 = _mode_fn("scatter1")
compact_argsort = _mode_fn("argsort")


def make_inputs(rng):
    boxes = rng.uniform(0, 640, (BATCH, K, 4)).astype(np.float32)
    conf = np.sort(rng.uniform(0.25, 1.0, (BATCH, K)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    cls = rng.integers(0, 5, (BATCH, K)).astype(np.int32)
    # realistic survivor pattern: ~10-40% alive, denser near the top
    alive = (rng.random((BATCH, K)) <
             np.linspace(0.8, 0.05, K)[None, :])
    return boxes, conf, cls, alive


def parity():
    rng = np.random.default_rng(7)
    b, c, k, a = make_inputs(rng)
    ref = jax.vmap(lambda *t: _compact(*t, MAXDET))(b, c, k, a)
    for name, fn in (("scatter1", compact_scatter1),
                     ("argsort", compact_argsort)):
        got = jax.vmap(lambda *t, fn=fn: fn(*t, MAXDET))(b, c, k, a)
        for i, (r, g) in enumerate(zip(ref, got)):
            # shipped compact zeroes dead rows; both variants do too
            assert np.array_equal(np.asarray(r), np.asarray(g)), \
                f"{name} mismatch at output {i}"
        print(f"parity {name}: identical", flush=True)


def timed(fn, label, inputs):
    boxes, conf, cls, alive = [jax.device_put(x) for x in inputs]

    @jax.jit
    def loop(boxes, conf):
        def it(_, state):
            bx, cf = state
            ob, os_, oc, ov = jax.vmap(
                lambda *t: fn(*t, MAXDET))(bx, cf, cls, alive)
            dep = (jnp.sum(ob.astype(jnp.float32))
                   + jnp.sum(os_.astype(jnp.float32))) * 1e-30
            return (bx + dep.astype(bx.dtype), cf + dep.astype(cf.dtype))
        return lax.fori_loop(0, ITERS, it, (boxes, conf))

    out = loop(boxes, conf)
    _ = np.asarray(out[0][0, 0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(boxes, conf)
        _ = np.asarray(out[0][0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{label:<12} {best:7.3f} ms/batch", flush=True)
    return best


if __name__ == "__main__":
    print(f"B={BATCH} K={K} max_det={MAXDET} iters={ITERS}", flush=True)
    parity()
    rng = np.random.default_rng(3)
    inputs = make_inputs(rng)
    base = timed(lambda b, c, k, a, m: (b, c, k, a[:m]),
                 "carry floor", inputs)
    t4 = timed(_compact, "scatter4", inputs)
    t1 = timed(compact_scatter1, "scatter1", inputs)
    ta = timed(compact_argsort, "argsort", inputs)
    print(f"deltas vs floor: scatter4 {t4-base:.3f} | scatter1 "
          f"{t1-base:.3f} | argsort {ta-base:.3f} ms/batch", flush=True)
