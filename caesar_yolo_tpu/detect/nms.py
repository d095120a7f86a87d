"""Fixed-shape, jit-able greedy NMS (TPU-native).

Replaces the NMS the reference gets for free from ultralytics
(`model(..., conf=score_thr, iou=iou_thr)`, reference
evaluation.py:181-193).  Everything here is static-shape: candidate
selection is a top-k, suppression runs on a [K, K] IoU matrix, and the
output is MAXDET-padded with a validity mask — the shape contract the
whole downstream pipeline (merge, stitch, gather over the device mesh)
relies on.

Semantics matched to the published torch pipeline:
  - single-label: per anchor, class = argmax, conf = max class prob
  - candidates: conf > conf_thr (strict)
  - class-aware suppression via per-class coordinate offsets
    (agnostic=False default)
  - greedy keep-highest-score suppression with strict `iou > iou_thr`
    (torchvision.ops.nms contract)
  - keep at most max_det (default 300), highest-score first

Suppression algorithm: instead of a K-step sequential greedy scan (slow
on TPU — K tiny dependent steps), the greedy solution is computed as the
fixpoint of  alive_i = !any(j < i, alive_j, iou[j,i] > thr)  iterated
from all-alive.  Each sweep is one vectorized [K, K] masked reduce, and
the iterate is exact: after t sweeps every box whose suppression-chain
depth is <= t has its final value, so `lax.while_loop` on "changed"
terminates with the greedy result (typically a handful of sweeps).

Truncation accounting: ultralytics considers up to 30000 pre-NMS
candidates; a fixed-shape TPU program must pick a static window
(`pre_nms`, [K, K] IoU memory grows quadratically).  Every call returns
`n_dropped` — the number of above-threshold candidates that fell outside
the top-`pre_nms` window — so callers can log instead of silently
truncating crowded fields.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.models.yolo import anchor_points, decode_dfl_window, \
    flatten_raw
from caesar_yolo_tpu.utils import portable as _portable
from caesar_yolo_tpu.utils.boxes import iou_matrix

MAX_WH = 7680.0  # class offset multiplier (larger than any letterbox size)
# 512 = 2x the typical crowded-field candidate count at reference
# thresholds; the [K, K] suppression cost is quadratic (1024 costs
# ~3ms/batch-128 extra on v5e), overflow is counted+logged, and
# callers can raise it (--pre_nms) for extreme fields.
DEFAULT_PRE_NMS = 512

import os as _os

_COMPACT_MODE = _os.environ.get("CY_COMPACT", "scatter1")


def set_compact_mode(mode: str) -> None:
    """scatter4 | scatter1 | argsort — affects subsequent traces."""
    global _COMPACT_MODE
    assert mode in ("scatter4", "scatter1", "argsort"), mode
    _COMPACT_MODE = mode


@partial(jax.jit, static_argnames=("conf_thr", "iou_thr", "max_det",
                                   "pre_nms", "class_agnostic"))
def nms_single(boxes: jnp.ndarray, scores: jnp.ndarray,
               conf_thr: float = 0.25, iou_thr: float = 0.5,
               max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
               class_agnostic: bool = False):
    """NMS for one image.

    boxes: [A, 4] xyxy; scores: [A, NC] per-class probabilities.
    Returns (boxes[max_det, 4], scores[max_det], cls[max_det] int32,
    valid[max_det] bool, n_dropped int32 scalar), score-descending.
    n_dropped counts above-threshold candidates beyond the pre_nms
    window (0 = exact, >0 = the crowded-field truncation was hit).
    """
    top_boxes, top_conf, top_cls, top_valid, n_dropped, nms_boxes = \
        _select_candidates(boxes, scores, conf_thr, pre_nms, class_agnostic)
    alive = _suppress_xla(nms_boxes, top_valid, iou_thr)
    out = _compact(top_boxes, top_conf, top_cls, alive, max_det)
    return (*out, n_dropped)


def _select_candidates(boxes, scores, conf_thr, pre_nms, class_agnostic):
    """Single-label candidate selection + score-descending top-k window."""
    conf = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    cand = conf > conf_thr

    k = min(pre_nms, boxes.shape[0])
    n_cand = jnp.sum(cand, dtype=jnp.int32)
    n_dropped = jnp.maximum(n_cand - k, 0)
    top_conf, top_idx = lax.top_k(jnp.where(cand, conf, -1.0), k)
    top_boxes = boxes[top_idx]
    top_cls = cls[top_idx]
    top_valid = top_conf > conf_thr

    nms_boxes = top_boxes
    if not class_agnostic:
        nms_boxes = top_boxes + (top_cls[:, None].astype(top_boxes.dtype)
                                 * MAX_WH)
    return top_boxes, top_conf, top_cls, top_valid, n_dropped, nms_boxes


def _select_candidates_raw(dist, logits, anchors, strides, conf_thr,
                           pre_nms, class_agnostic):
    """Logit-space candidate selection + window-only DFL decode (one
    image): dist [A, 4, REG_MAX] raw box logits, logits [A, NC] raw
    class logits.

    Exactly `_select_candidates` composed with `decode_dfl`, computed
    cheaper: sigmoid is strictly monotone, so max/argmax/threshold/top-k
    run on raw logits, and the f32 DFL softmax-expectation runs only on
    the selected pre_nms window instead of every anchor.  Only
    observable difference: score ties that exist in f32 sigmoid space
    but not in logit space (sigmoid saturation at |logit| >~ 17) can
    break index order differently.
    """
    mlog = jnp.max(logits, axis=-1).astype(jnp.float32)
    cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if conf_thr <= 0.0:
        lthr = -jnp.inf          # conf = sigmoid(mlog) > 0 is always true
    elif conf_thr >= 1.0:
        lthr = jnp.inf
    else:
        lthr = math.log(conf_thr / (1.0 - conf_thr))
    cand = mlog > lthr

    k = min(pre_nms, mlog.shape[0])
    n_cand = jnp.sum(cand, dtype=jnp.int32)
    n_dropped = jnp.maximum(n_cand - k, 0)
    top_ml, top_idx = lax.top_k(jnp.where(cand, mlog, -jnp.inf), k)
    top_conf = jax.nn.sigmoid(top_ml)
    top_cls = cls[top_idx]
    top_valid = top_ml > lthr
    top_boxes = decode_dfl_window(dist[top_idx], anchors[top_idx],
                                  strides[top_idx])

    nms_boxes = top_boxes
    if not class_agnostic:
        nms_boxes = top_boxes + (top_cls[:, None].astype(top_boxes.dtype)
                                 * MAX_WH)
    return top_boxes, top_conf, top_cls, top_valid, n_dropped, nms_boxes


def _suppress_xla(nms_boxes, top_valid, iou_thr):
    """Greedy fixpoint sweeps over the materialized [K, K] IoU matrix."""
    k = nms_boxes.shape[0]
    iou = iou_matrix(nms_boxes, nms_boxes)

    # suppress[j, i]: candidate j, if alive, would kill i (rows are
    # score-descending, so j < i means j outranks i).
    js = jnp.arange(k)
    higher = js[:, None] < js[None, :]
    suppress = (iou > iou_thr) & higher & top_valid[:, None] \
        & top_valid[None, :]

    def sweep(state):
        alive, _ = state
        killed = jnp.any(suppress & alive[:, None], axis=0)
        new_alive = top_valid & ~killed
        return new_alive, jnp.any(new_alive != alive)

    def cond(state):
        return state[1]

    alive, _ = lax.while_loop(cond, sweep, (top_valid, jnp.bool_(True)))
    return alive


def _compact(top_boxes, top_conf, top_cls, alive, max_det):
    """Compact kept rows into a fixed [max_det] output, score order
    preserved, dead rows zeroed.  Three bit-identical formulations
    (parity pinned by tests/test_detect.py; A/B via CY_COMPACT env or
    set_compact_mode — affects subsequent traces, like CY_UPSAMPLE):

      scatter4  four separate .at[dst].set scatters by rank (the
                original formulation)
      scatter1  ONE scatter of a packed [K, 8] f32 row (cls < 2^24 so
                the f32 round-trip is exact)
      argsort   stable argsort of ~alive + gather of the first max_det
                rows (kept rows keep their score-descending order)

    On-chip deltas vs an identical carry loop (perf/probe_compact_r5.log,
    B=128, K=512, max_det=300): scatter4 0.712, scatter1 0.397, argsort
    0.599 ms/batch — scatter1 (one scatter instead of four) is the
    default; the others remain as measured A/B points."""
    if _COMPACT_MODE == "argsort":
        order = jnp.argsort(~alive, stable=True)[:max_det]
        n_alive = jnp.sum(alive.astype(jnp.int32))
        valid = jnp.arange(max_det) < n_alive
        z = valid.astype(top_boxes.dtype)[:, None]
        return (top_boxes[order] * z, top_conf[order] * z[:, 0],
                jnp.where(valid, top_cls[order], 0), valid)
    rank = jnp.cumsum(alive) - 1
    dst = jnp.where(alive & (rank < max_det), rank, max_det)
    if _COMPACT_MODE == "scatter1":
        packed = jnp.concatenate([
            top_boxes.astype(jnp.float32),
            top_conf[:, None].astype(jnp.float32),
            top_cls[:, None].astype(jnp.float32),
            alive[:, None].astype(jnp.float32),
            jnp.zeros((top_boxes.shape[0], 1), jnp.float32)], axis=1)
        out = jnp.zeros((max_det + 1, 8), jnp.float32).at[dst].set(
            packed)[:max_det]
        return (out[:, :4].astype(top_boxes.dtype),
                out[:, 4].astype(top_conf.dtype),
                out[:, 5].astype(jnp.int32), out[:, 6] > 0)
    out_boxes = jnp.zeros((max_det + 1, 4), top_boxes.dtype).at[dst].set(
        top_boxes)[:max_det]
    out_scores = jnp.zeros((max_det + 1,), top_conf.dtype).at[dst].set(
        top_conf)[:max_det]
    out_cls = jnp.zeros((max_det + 1,), jnp.int32).at[dst].set(
        top_cls)[:max_det]
    out_valid = jnp.zeros((max_det + 1,), bool).at[dst].set(
        alive)[:max_det]
    return out_boxes, out_scores, out_cls, out_valid


@partial(jax.jit, static_argnames=("conf_thr", "iou_thr", "max_det",
                                   "pre_nms", "class_agnostic",
                                   "use_pallas"))
def _nms_batch_impl(boxes, scores, conf_thr, iou_thr, max_det, pre_nms,
                    class_agnostic, use_pallas):
    top_boxes, top_conf, top_cls, top_valid, n_dropped, nms_boxes = \
        jax.vmap(lambda b, s: _select_candidates(
            b, s, conf_thr, pre_nms, class_agnostic))(boxes, scores)
    alive = _suppress_batch(nms_boxes, top_valid, iou_thr, use_pallas)
    outs = jax.vmap(lambda tb, tc, tk, al: _compact(
        tb, tc, tk, al, max_det))(top_boxes, top_conf, top_cls, alive)
    return (*outs, n_dropped)


def nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
              conf_thr: float = 0.25, iou_thr: float = 0.5,
              max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
              class_agnostic: bool = False):
    """Batched NMS: boxes [B, A, 4], scores [B, A, NC] ->
    (boxes[B, max_det, 4], scores[B, max_det], cls[B, max_det],
    valid[B, max_det], n_dropped[B]).

    On TPU the suppression fixpoint runs as a VMEM-resident Pallas
    kernel (detect/pallas_nms.py) — numerically identical to the XLA
    sweep path used everywhere else."""
    return _nms_batch_impl(boxes, scores, conf_thr, iou_thr, max_det,
                           pre_nms, class_agnostic,
                           _use_pallas_suppression())


class portable_suppression:
    """Context manager forcing the XLA formulations of every Pallas
    kernel during tracing (used by deploy.export_detector).

    While portable.FORCE is True, suppression traces the
    platform-neutral XLA sweeps even on a TPU host, so jax.export
    artifacts never bake in the Mosaic kernel (which would not lower
    for other platforms).  The flag is shared (utils/portable.py): the
    preprocessing stages' native batch kernels honor it too
    (ops/transforms.Pipeline.apply_batch)."""

    def __enter__(self):
        self._prev = _portable.FORCE
        _portable.FORCE = True

    def __exit__(self, *exc):
        _portable.FORCE = self._prev
        return False


def _use_pallas_suppression() -> bool:
    """Resolve the Pallas-vs-XLA suppression choice OUTSIDE the jitted
    implementations so it enters their jit cache key as a static
    argument.  Reading portable.FORCE (or the backend) inside a
    module-level @jax.jit function would freeze the first-seen branch
    into its trace cache — a later jax.export under
    portable_suppression() hitting that cache would silently bake the
    Mosaic kernel into the artifact (and the converse ordering would pin
    post-export TPU runs to the XLA path).  'axon' is this repo's TPU
    backend name on the tunneled chip (same gate as
    ops/pallas_upsample.py, models/pallas_attn.py)."""
    return (jax.default_backend() in ("tpu", "axon")
            and not _portable.FORCE)


def _suppress_batch(nms_boxes, top_valid, iou_thr, use_pallas=None):
    """Batched suppression: VMEM-resident Pallas kernel on TPU
    (detect/pallas_nms.py), the XLA sweeps everywhere else — numerically
    identical (parity pinned by tests/test_pallas_nms.py).
    use_pallas=None resolves from the backend + portable flag now."""
    if use_pallas is None:
        use_pallas = _use_pallas_suppression()
    if use_pallas:
        from caesar_yolo_tpu.detect.pallas_nms import nms_suppress
        return nms_suppress(jnp.transpose(nms_boxes, (0, 2, 1)),
                            top_valid, iou_thr)
    return jax.vmap(lambda nb, tv: _suppress_xla(nb, tv, iou_thr))(
        nms_boxes, top_valid)


@partial(jax.jit, static_argnames=("img_size", "conf_thr", "iou_thr",
                                   "max_det", "pre_nms", "class_agnostic",
                                   "use_pallas"))
def _nms_batch_raw_impl(raw, img_size, conf_thr, iou_thr, max_det,
                        pre_nms, class_agnostic, use_pallas):
    dist, logits = flatten_raw(raw)
    anchors, strides = anchor_points(img_size)
    top_boxes, top_conf, top_cls, top_valid, n_dropped, nms_boxes = \
        jax.vmap(lambda d, l: _select_candidates_raw(
            d, l, anchors, strides, conf_thr, pre_nms,
            class_agnostic))(dist, logits)
    alive = _suppress_batch(nms_boxes, top_valid, iou_thr, use_pallas)
    outs = jax.vmap(lambda tb, tc, tk, al: _compact(
        tb, tc, tk, al, max_det))(top_boxes, top_conf, top_cls, alive)
    return (*outs, n_dropped)


def nms_batch_raw(raw, img_size: int,
                  conf_thr: float = 0.25, iou_thr: float = 0.5,
                  max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
                  class_agnostic: bool = False):
    """Fused decode+NMS straight from raw head outputs.

    Same contract as `nms_batch(*decode_dfl(raw, img_size), ...)` —
    parity-pinned by tests/test_detect.py — with selection in logit
    space and the f32 DFL softmax-expectation computed only on the
    selected pre_nms window.

    NOT the default hot path.  Measured on v5e (in-graph interleaved
    A/B, yolov8n B=128): 21.7 vs 19.6 ms/batch AGAINST this variant —
    the window gathers (dist[top_idx]: 64-element rows at unaligned
    indices) cost more than the full-array softmax+sigmoid they avoid,
    which XLA fuses into neighbors essentially for free.  A middle
    variant (logit-space selection, full-array decode) measured neutral
    (19.9 vs 19.8).  Kept with parity tests as the documented negative
    result and for backends where gathers are cheap.
    """
    return _nms_batch_raw_impl(raw, img_size, conf_thr, iou_thr, max_det,
                               pre_nms, class_agnostic,
                               _use_pallas_suppression())
