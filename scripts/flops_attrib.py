"""Per-layer FLOPs via XLA cost analysis (CPU) — pair with the measured
per-layer deltas from scripts/perf_attrib.py to get per-stage MFU and
find the stages leaving MXU throughput on the table.

Usage: python scripts/flops_attrib.py [model] [imgsz] [batch-for-mfu]
       [attrib-log]
When an attrib log (perf_attrib.py output) is given, prints a merged
table: layer, GFLOP/img, measured ms delta, achieved TFLOP/s, % of the
197 TFLOP/s v5e bf16 peak.
"""

import re
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from caesar_yolo_tpu.models.layers import Concat
from caesar_yolo_tpu.models.yolo import build_model, init_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "yolo11l"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 640
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 128
LOG = sys.argv[4] if len(sys.argv) > 4 else None
PEAK_TFLOPS = 197.0  # v5e bf16

model = build_model(MODEL, num_classes=5)
params = init_params(model, 0)


def layer_flops(module, p, in_shapes):
    """FLOPs of one layer at batch=1 via XLA cost analysis."""
    args = [jnp.zeros(s, jnp.float32) for s in in_shapes]

    def fn(p, *xs):
        return (module(p, list(xs)) if isinstance(module, Concat)
                else module(p, xs[0]))

    try:
        cost = jax.jit(fn).lower(p, *args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:  # pragma: no cover
        print(f"  (cost analysis failed: {e})")
        return 0.0


def head_flops(head, p, in_shapes):
    args = [jnp.zeros(s, jnp.float32) for s in in_shapes]
    cost = jax.jit(lambda p, xs: head(p, xs)).lower(
        p, args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def parse_attrib(path):
    """ms deltas per layer label from a perf_attrib.py log."""
    deltas, last = {}, None
    for line in open(path):
        m = re.match(r"(thru L\d+ \S+|preproc|letterbox|forward|decode|"
                     r"nms|full)\s+([\d.]+) ms/batch", line)
        if m:
            last = m.group(1)
            deltas.setdefault(last, [None, None])[0] = float(m.group(2))
        m = re.search(r"delta\s+([+-][\d.]+) ms", line)
        if m and last:
            deltas[last][1] = float(m.group(1))
    return deltas


def main():
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    shapes = {}
    prev = x.shape
    saved = {}
    per_layer = []
    y = x
    # trace shapes layer by layer with eval_shape
    for i, spec in enumerate(model.layers):
        in_idx = [j for j in spec.frm]
        in_shapes = [prev if j == -1 else shapes[j] for j in in_idx]
        p = params.get(spec.name, {})
        fl = layer_flops(spec.module, p, in_shapes)

        def fwd(p, *xs):
            return (spec.module(p, list(xs))
                    if isinstance(spec.module, Concat)
                    else spec.module(p, xs[0]))
        out = jax.eval_shape(fwd, p,
                             *[jax.ShapeDtypeStruct(s, jnp.float32)
                               for s in in_shapes])
        shapes[i] = out.shape
        prev = out.shape
        per_layer.append((f"L{i} {spec.name}", fl))
    hf = head_flops(model.head, params.get("head", params.get("detect", {})),
                    [shapes[j] for j in model.out_idx])
    per_layer.append(("head", hf))

    deltas = parse_attrib(LOG) if LOG else {}
    total = sum(f for _, f in per_layer)
    print(f"model={MODEL} imgsz={S}  total {total / 1e9:.2f} GFLOP/img")
    print(f"{'layer':22s} {'GFLOP':>8s} {'ms':>8s} {'TFLOP/s':>9s} "
          f"{'%peak':>6s}")
    for label, fl in per_layer:
        key = None
        if label == "head":
            key = "forward"
        else:
            ln = label.split()[0][1:]
            for k in deltas:
                if k.startswith(f"thru L{ln} "):
                    key = k
        ms = deltas.get(key, [None, None])[1] if key else None
        if ms is not None and ms > 0.02:
            tf = BATCH * fl / (ms * 1e-3) / 1e12
            print(f"{label:22s} {fl / 1e9:8.2f} {ms:8.2f} {tf:9.1f} "
                  f"{100 * tf / PEAK_TFLOPS:5.1f}%")
        else:
            print(f"{label:22s} {fl / 1e9:8.2f} {'-':>8s}")


if __name__ == "__main__":
    main()
