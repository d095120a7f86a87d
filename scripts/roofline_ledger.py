"""The yolo11l roofline LEDGER: per-stage measured-ms vs floor-ms with
the ceiling mechanism, summing to the full batch time (VERDICT r3 #3).

For every pipeline stage (preproc, letterbox, each graph layer, head,
decode, NMS) this computes two floors at the bench batch:

  mxu_ms  — lane-weighted MXU floor: for each conv/dot in the stage,
            flops / (PEAK_TFLOPS * occ) where occ = min(1, Cout/128) is
            the output-channel lane occupancy of the 128-lane MXU (the
            structural ceiling of yolo11's e=0.25 C3k2 blocks — STATUS
            note 9).  Element-wise flops ride along at full occupancy.
  hbm_ms  — bandwidth floor: XLA cost-analysis bytes accessed / HBM BW.

  floor_ms = max(mxu_ms, hbm_ms); mechanism = whichever binds.

Merged with the measured per-stage deltas from scripts/perf_attrib.py
(run on the real chip), the table shows where measured sits against the
floor for EVERY ms of the batch — the proof that the remaining gap over
the all-stages-at-floor bound is structural, stage by stage.

Usage:
  # on-chip: python scripts/perf_attrib.py yolo11l 128 20 > attrib_11l.log
  python scripts/roofline_ledger.py yolo11l 640 128 attrib_11l.log
"""

from __future__ import annotations

import re
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from caesar_yolo_tpu.models.layers import Concat
from caesar_yolo_tpu.models.yolo import build_model, decode_dfl, init_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "yolo11l"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 640
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 128
LOG = sys.argv[4] if len(sys.argv) > 4 else None

PEAK_TFLOPS = 197.0   # v5e bf16 MXU peak
HBM_GBPS = 819.0      # v5e HBM bandwidth
LANES = 128


def _walk(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            fg = eqn.params.get("feature_group_count", 1)
            o = eqn.outvars[0].aval.shape
            # NHWC/HWIO assumed (this package's only layout)
            cout = o[dn.out_spec.index(1) if hasattr(dn, "out_spec")
                     else -1] if False else o[-1]
            cin = lhs[-1]
            kh, kw = rhs[0], rhs[1]
            n_spatial = int(np.prod(o[:-1]))
            flops = 2.0 * n_spatial * cout * (cin // fg) * kh * kw
            # depthwise/grouped convs are bandwidth-bound on TPU (XLA's
            # grouped lowering measured at 98-173 GB/s, STATUS note 11),
            # not MXU-lane-bound: weighting their tiny FLOP count by
            # cout/groups/128 lanes inflates the floor past measured
            # time (the v11 head's dwconv floor came out 14 ms vs
            # 8.6 ms measured).  Their compute floor rides at full
            # occupancy; the HBM term carries their real cost.
            occ = min(1.0, cout / LANES) if fg == 1 else 1.0
            out.append(("conv", flops, occ,
                        f"{kh}x{kw} Cin={cin} Cout={cout}"
                        + (f" g={fg}" if fg > 1 else "")))
        elif eqn.primitive.name in ("dot_general",):
            a, b = eqn.invars[0].aval, eqn.invars[1].aval
            o = eqn.outvars[0].aval
            dims = eqn.params["dimension_numbers"][0][0]
            k = int(np.prod([a.shape[d] for d in dims]))
            flops = 2.0 * int(np.prod(o.shape)) * k
            lane = o.shape[-1] if o.ndim else 1
            out.append(("dot", flops, min(1.0, lane / LANES),
                        f"dot k={k} n={lane}"))
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                _walk(inner, out)
            if isinstance(v, (list, tuple)):
                for w in v:
                    inner = getattr(w, "jaxpr", None)
                    if inner is not None:
                        _walk(inner, out)


def stage_floors(fn, *args):
    """(mxu_ms, hbm_ms, mechanism_detail) for fn at BATCH (args are
    batch-1 shapes; flops/bytes scale linearly).

    The HBM floor counts only the UNAVOIDABLE traffic of a perfectly
    fused stage — its input activations, output activations, and
    weights, each crossing HBM once.  (XLA cost-analysis 'bytes
    accessed' counts every intermediate and overestimates a fused TPU
    stage ~4x.)  Weights are batch-invariant, activations scale with
    BATCH."""
    closed = jax.make_jaxpr(fn)(*args)
    ops = []
    _walk(closed.jaxpr, ops)
    lane_floor_s = sum(f / (PEAK_TFLOPS * 1e12 * occ)
                       for _, f, occ, _ in ops)
    flops = sum(f for _, f, _, _ in ops)

    def nbytes(tree, batch_scaled):
        tot = 0
        for a in jax.tree_util.tree_leaves(tree):
            n = int(np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize
            # heuristic: arrays with a leading batch-1 axis are
            # activations (scale by BATCH); everything else is weights
            scaled = (len(a.shape) >= 3 and a.shape[0] == 1)
            tot += n * (BATCH if (batch_scaled and scaled) else 1)
        return tot

    out = jax.eval_shape(fn, *args)
    byts = nbytes(args, True) + nbytes(out, True)
    mxu_ms = BATCH * lane_floor_s * 1e3
    hbm_ms = byts / (HBM_GBPS * 1e9) * 1e3
    worst = min((occ for _, _, occ, _ in ops), default=1.0)
    detail = (f"{flops * BATCH / 1e9:.0f} GFLOP "
              f"min-occ {worst * 100:.0f}%")
    return mxu_ms, hbm_ms, detail


def parse_attrib(path):
    rows = []
    for line in open(path):
        m = re.match(r"\s*(thru L\d+ \S+|preproc|letterbox|forward|decode"
                     r"|nms|full)\s+([\d.]+) ms/batch", line)
        if m:
            rows.append([m.group(1), float(m.group(2)), None])
        m = re.search(r"delta\s+([+-][\d.]+) ms", line)
        if m and rows:
            rows[-1][2] = float(m.group(1))
    return {r[0]: r[2] for r in rows}, rows


def main():
    model = build_model(MODEL, num_classes=5)
    params = init_params(model, 0)
    deltas, _ = parse_attrib(LOG) if LOG else ({}, [])

    # per-layer floors (batch-1 tracing, scaled by BATCH)
    shapes, saved = {}, {}
    prev = (1, S, S, 3)
    table = []  # (label, measured_ms, mxu_ms, hbm_ms, detail)

    from caesar_yolo_tpu.ops import build_preprocessor
    pp = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    x1 = jnp.zeros((1, S, S, 1), jnp.float32)
    table.append(("preproc", deltas.get("preproc"),
                  *stage_floors(lambda t: pp.apply_batch(t)[0], x1)))
    from caesar_yolo_tpu.detect.letterbox import letterbox_batch
    x3 = jnp.zeros((1, S, S, 3), jnp.float32)
    table.append(("letterbox", deltas.get("letterbox"),
                  *stage_floors(
                      lambda t: letterbox_batch(t, S).astype(jnp.bfloat16),
                      x3)))

    for i, spec in enumerate(model.layers):
        in_shapes = [prev if f == -1 else shapes[f] for f in spec.frm]
        p = params.get(spec.name, {})

        def fwd(p, *xs):
            return (spec.module(p, list(xs))
                    if isinstance(spec.module, Concat)
                    else spec.module(p, xs[0]))

        args = [jnp.zeros(s, jnp.bfloat16) for s in in_shapes]
        mx, hb, det = stage_floors(fwd, p, *args)
        out = jax.eval_shape(fwd, p, *[jax.ShapeDtypeStruct(s, jnp.bfloat16)
                                       for s in in_shapes])
        shapes[i] = out.shape
        prev = out.shape
        label = f"L{i} {spec.name}"
        ms = None
        for k, v in deltas.items():
            if k.startswith(f"thru L{i} "):
                ms = v
        table.append((label, ms, mx, hb, det))

    hp = params.get("head", params.get("detect", {}))
    hargs = [jnp.zeros(shapes[j], jnp.bfloat16) for j in model.out_idx]
    table.append(("head", deltas.get("forward"),
                  *stage_floors(lambda p, xs: model.head(p, xs), hp,
                                hargs)))
    raw = jax.eval_shape(lambda p, xs: model.head(p, xs), hp,
                         [jax.ShapeDtypeStruct(shapes[j], jnp.bfloat16)
                          for j in model.out_idx])
    raw_zeros = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, jnp.float32), raw)
    table.append(("decode", deltas.get("decode"),
                  *stage_floors(lambda r: decode_dfl(r, S), raw_zeros)))
    from caesar_yolo_tpu.detect.nms import nms_batch
    nb, nsc = jax.eval_shape(lambda r: decode_dfl(r, S), raw_zeros)
    table.append(("nms", deltas.get("nms"),
                  *stage_floors(
                      lambda b, s: nms_batch(b, s, conf_thr=0.7,
                                             iou_thr=0.5)[:2],
                      jnp.zeros(nb.shape, jnp.float32),
                      jnp.zeros(nsc.shape, jnp.float32))))

    print(f"model={MODEL} S={S} B={BATCH}  peak={PEAK_TFLOPS} TFLOP/s "
          f"HBM={HBM_GBPS} GB/s")
    print(f"{'stage':20s} {'meas ms':>8s} {'floor ms':>9s} "
          f"{'mxu ms':>8s} {'hbm ms':>8s}  mechanism")
    tm = tf = 0.0
    for label, ms, mx, hb, det in table:
        floor = max(mx, hb)
        mech = ("lane-limited MXU" if mx >= hb else "HBM bandwidth")
        tm += ms or 0.0
        tf += floor
        mss = f"{ms:8.2f}" if ms is not None else f"{'-':>8s}"
        print(f"{label:20s} {mss} {floor:9.3f} {mx:8.3f} {hb:8.3f}"
              f"  {mech}; {det}")
    print(f"{'TOTAL':20s} {tm:8.2f} {tf:9.2f}   "
          f"-> bound {BATCH / (tf / 1e3):.0f} tiles/s at floor, "
          f"measured {BATCH / (tm / 1e3):.0f} tiles/s"
          if tm else f"{'TOTAL floors':20s} {tf:9.2f}")


if __name__ == "__main__":
    main()
