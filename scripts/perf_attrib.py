"""On-chip stage attribution for the e2e detect pipeline (in-graph deltas).

Methodology (STATUS.md Performance notes): the host<->chip relay has a
~6.5 ms dispatch floor, so each variant runs ITERS chained iterations
inside ONE compiled program (lax.fori_loop) and we attribute cost by
subtracting variant times.  Variants truncate the pipeline after a given
stage; the truncated output is reduced to a scalar that feeds the carry
so XLA cannot dead-code the retained stages.

Usage: python scripts/perf_attrib.py [model] [batch] [iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.detect.letterbox import letterbox_batch, unletterbox_boxes
from caesar_yolo_tpu.detect.nms import nms_batch
from caesar_yolo_tpu.models.yolo import build_model, decode_dfl, init_params
from caesar_yolo_tpu.ops import build_preprocessor
from caesar_yolo_tpu.parallel.engine import fuse_model_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "yolov8n"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
S = 640

model = build_model(MODEL, num_classes=5)
params = jax.device_put(fuse_model_params(model, init_params(model, 0)))
preproc = build_preprocessor(zscale_stretch=True, normalize_minmax=True)


def scalar(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def make_variant(stop):
    """stop in: preproc, letterbox, backbone:<k>, forward, decode, nms,
    full."""

    def step(params, x):
        imgs, ok = preproc.apply_batch(x)
        if stop == "preproc":
            return scalar(imgs)
        imgs = jnp.repeat(imgs, 3, axis=-1)
        xx = letterbox_batch(imgs, S).astype(jnp.bfloat16)
        if stop == "letterbox":
            return scalar(xx)
        if stop.startswith("backbone:"):
            from caesar_yolo_tpu.models.layers import Concat
            k = int(stop.split(":")[1])
            saved = {}
            y = xx
            for i, spec in enumerate(model.layers[: k + 1]):
                ins = [y if f == -1 else saved[f] for f in spec.frm]
                p = params.get(spec.name, {})
                y = (spec.module(p, ins) if isinstance(spec.module, Concat)
                     else spec.module(p, ins[0]))
                saved[i] = y
            return scalar(y)
        raw = model(params, xx)
        if stop == "forward":
            return scalar(raw)
        boxes, scores = decode_dfl(raw, S)
        if stop == "decode":
            return scalar(boxes) + scalar(scores)
        b, s, c, v, _ = nms_batch(boxes, scores, conf_thr=0.7, iou_thr=0.5)
        if stop == "nms":
            return scalar(b) + scalar(s)
        b = unletterbox_boxes(b, S, S, S)
        return scalar(b) + scalar(s)

    @jax.jit
    def loop(params, tiles):
        def body(_, x):
            # *1e-30, not *0.0: XLA folds x*0 (and with it the whole
            # retained pipeline) in some variants; 1e-30 keeps a live
            # data dependency with negligible value perturbation.
            dep = step(params, x) * 1e-30
            return x + dep.astype(x.dtype)
        return lax.fori_loop(0, ITERS, body, tiles)

    return loop


def time_variant(name, loop, tiles):
    out = loop(params, tiles)
    _ = np.asarray(out[0, 0, 0, 0])
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        out = loop(params, tiles)
        _ = np.asarray(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:24s} {ms:8.2f} ms/batch   "
          f"{BATCH / (best / ITERS):9.1f} tiles/s")
    return ms


def main():
    rng = np.random.default_rng(0)
    tiles = jax.device_put(jnp.asarray(
        rng.random((BATCH, S, S, 1), dtype=np.float32)))

    names = [spec.name for spec in model.layers]
    stops = ["preproc", "letterbox"]
    stops += [f"backbone:{k}" for k in range(len(names))]
    stops += ["forward", "decode", "nms", "full"]

    print(f"model={MODEL} B={BATCH} iters={ITERS} "
          f"device={jax.devices()[0].device_kind}")
    prev = 0.0
    for stop in stops:
        label = stop
        if stop.startswith("backbone:"):
            k = int(stop.split(":")[1])
            label = f"thru L{k} {names[k]}"
        ms = time_variant(label, make_variant(stop), tiles)
        print(f"{'':24s} delta {ms - prev:+7.2f} ms")
        prev = ms


if __name__ == "__main__":
    main()
