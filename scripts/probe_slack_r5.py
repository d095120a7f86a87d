"""Ledger-slack measurement probes (VERDICT r4 #3): convert the yolo11l
roofline ledger's asserted residuals into MEASURED ones.

Four probe families, each an in-graph chained lax.fori_loop (the only
timing methodology that attributes cost on this relay — STATUS note 1),
each timed over R repeats with the MIN reported (dispatch noise is
one-sided):

  A. preproc: the fused zscale+minmax chain standalone at B=128 @640
     (its cost with nothing else in the program) vs the ledger's
     in-graph truncation delta (2.64 ms) vs its 0.51 ms HBM floor.
  B. isolated-stage steady rate for the full-width conv stages the r4
     ledger closed "by assertion" (L3/L6/L13/L19 run at 55-65% of MXU
     peak attributed to ramp/relayout WITHOUT a measurement): each stage
     body chained alone in a loop — if the isolated rate matches the
     in-graph delta, the deficit is intrinsic to the conv stack (XLA
     conv pipeline ramp), NOT inter-stage relayout.
  C. back-to-back invocation: the same stage twice per iteration with a
     scalar dependency between them — the second invocation sees
     layouts already settled, so (pair - single) vs single measures the
     steady marginal cost directly.
  D. decode/nms split: variants truncating after decode, after the
     top-k candidate selection, and after the full NMS — separates DFL
     decode / selection / [K,K] suppression fixpoint / compaction,
     which the r4 ledger lumps as one 3.88 ms row.

Usage: python scripts/probe_slack_r5.py [model=yolo11l] [batch=128]
           [iters=30] [repeats=3]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.detect.letterbox import letterbox_batch
from caesar_yolo_tpu.detect.nms import (_select_candidates,
                                        _suppress_batch, nms_batch)
from caesar_yolo_tpu.models.layers import Concat
from caesar_yolo_tpu.models.yolo import (build_model, decode_dfl,
                                         init_params)
from caesar_yolo_tpu.ops import build_preprocessor
from caesar_yolo_tpu.parallel.engine import fuse_model_params

MODEL = sys.argv[1] if len(sys.argv) > 1 else "yolo11l"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 30
REPEATS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
S = 640

model = build_model(MODEL, num_classes=5)
params = jax.device_put(fuse_model_params(model, init_params(model, 0)))
preproc = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
rng = np.random.default_rng(0)


def scalar(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def timed_loop(body, x0, label):
    """ms per iteration of `body` chained ITERS times, min over REPEATS."""

    @jax.jit
    def loop(params, x):
        def it(_, x):
            # `* 0.0` here would be algebraically folded to 0 by XLA and
            # the then-loop-invariant body hoisted out entirely (measured:
            # the whole probe collapsed to 0.008 ms/iter); a denormal
            # multiplier keeps the dependence real at negligible value
            dep = scalar(body(params, x)) * 1e-30
            return jax.tree_util.tree_map(
                lambda a: a + dep.astype(a.dtype), x)
        return lax.fori_loop(0, ITERS, it, x)

    def block(out):
        # force execution by pulling ONE element (device-side index,
        # then an 8-byte D2H).  np.asarray on the whole leaf would ship
        # the ~210 MB carry over the relay (measured 380 ms/iter of pure
        # D2H), and block_until_ready does NOT force execution on this
        # tunneled backend (measured 0.008 ms/iter for any body).
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    x0 = jax.device_put(x0)
    block(loop(params, x0))
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        block(loop(params, x0))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    print(f"{label:<44} {best:9.3f} ms/batch", flush=True)
    return best


def noop_floor():
    x = rng.random((BATCH, S, S, 1), dtype=np.float32)
    return timed_loop(lambda p, t: t * 1.0000001, x, "empty loop (floor)")


def probe_preproc():
    print("== A. preproc standalone ==", flush=True)
    x = rng.random((BATCH, S, S, 1), dtype=np.float32)
    base = noop_floor()
    full = timed_loop(lambda p, t: preproc.apply_batch(t)[0], x,
                      "zscale+minmax chain")
    print(f"preproc standalone delta: {full - base:.3f} ms "
          f"(r4 in-graph delta 2.64, HBM floor 0.51)", flush=True)


def _stage_modules():
    """name -> (module, params, input shape) for the probe stages, by
    tracing shapes through the graph like roofline_ledger does."""
    shapes = {}
    prev = (1, S, S, 3)
    out = {}
    for i, spec in enumerate(model.layers):
        in_shapes = [prev if f == -1 else shapes[f] for f in spec.frm]
        p = params.get(spec.name, {})

        def fwd(p, *xs, spec=spec):
            return (spec.module(p, list(xs))
                    if isinstance(spec.module, Concat)
                    else spec.module(p, xs[0]))

        o = jax.eval_shape(fwd, p, *[jax.ShapeDtypeStruct(s, jnp.bfloat16)
                                     for s in in_shapes])
        out[f"L{i} {spec.name}"] = (spec, p, in_shapes)
        shapes[i] = o.shape
        prev = o.shape
    return out


def probe_isolated_stages(targets=("down2", "c3k2_3", "neck_p4a",
                                   "neck_p4")):
    print("== B/C. isolated full-width conv stages ==", flush=True)
    stages = _stage_modules()
    for label, (spec, p, in_shapes) in stages.items():
        if not any(t in label for t in targets):
            continue
        if len(in_shapes) != 1:
            continue
        shp = (BATCH,) + tuple(in_shapes[0][1:])
        x = rng.standard_normal(shp).astype(np.float32)

        def single(params, t, spec=spec, p=p):
            return spec.module(p, t.astype(jnp.bfloat16))

        def pair(params, t, spec=spec, p=p):
            y1 = spec.module(p, t.astype(jnp.bfloat16))
            d = scalar(y1) * 0.0
            y2 = spec.module(p, (t + d.astype(t.dtype))
                             .astype(jnp.bfloat16))
            return (y1, y2)

        base = timed_loop(lambda p_, t: t * 1.0000001, x,
                          f"{label} carry floor")
        one = timed_loop(single, x, f"{label} x1") - base
        two = timed_loop(pair, x, f"{label} x2") - base
        print(f"{label}: single {one:.3f} ms, marginal 2nd "
              f"{two - one:.3f} ms (steady rate; ledger floor/meas in "
              f"perf/ledger_11l_r4.txt)", flush=True)


def probe_decode_nms():
    print("== D. decode / selection / suppression split ==", flush=True)
    # raw head outputs as the loop carry: run the forward ONCE eagerly,
    # then chain only the post-head stages
    x = rng.random((BATCH, S, S, 1), dtype=np.float32)

    @jax.jit
    def head_out(params, t):
        imgs, ok = preproc.apply_batch(t)
        imgs = jnp.repeat(imgs, 3, axis=-1)
        xx = letterbox_batch(imgs, S).astype(jnp.bfloat16)
        return model(params, xx)

    raw = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a)),
        head_out(params, jax.device_put(x)))

    def v_decode(params, raw):
        return decode_dfl(raw, S)

    def v_select(params, raw):
        boxes, scores = decode_dfl(raw, S)
        return jax.vmap(lambda b, s: _select_candidates(
            b, s, 0.7, 512, False))(boxes, scores)

    def v_suppress(params, raw):
        boxes, scores = decode_dfl(raw, S)
        sel = jax.vmap(lambda b, s: _select_candidates(
            b, s, 0.7, 512, False))(boxes, scores)
        top_boxes, top_conf, top_cls, top_valid, n_drop, nms_boxes = sel
        return _suppress_batch(nms_boxes, top_valid, 0.5)

    def v_full(params, raw):
        boxes, scores = decode_dfl(raw, S)
        return nms_batch(boxes, scores, conf_thr=0.7, iou_thr=0.5)

    base = timed_loop(lambda p, r: jax.tree_util.tree_map(
        lambda a: a * 1.0000001, r), raw, "raw carry floor")
    d = timed_loop(v_decode, raw, "decode only") - base
    s = timed_loop(v_select, raw, "decode+selection") - base
    sp = timed_loop(v_suppress, raw, "decode+selection+suppress") - base
    f = timed_loop(v_full, raw, "decode+full nms") - base
    print(f"split: decode {d:.3f} | top-k selection {s - d:.3f} | "
          f"suppression {sp - s:.3f} | compact {f - sp:.3f} "
          f"(r4 ledger: decode 1.21 + nms 2.67)", flush=True)


if __name__ == "__main__":
    print(f"model={MODEL} B={BATCH} iters={ITERS} repeats={REPEATS}",
          flush=True)
    probe_preproc()
    probe_decode_nms()
    probe_isolated_stages()
