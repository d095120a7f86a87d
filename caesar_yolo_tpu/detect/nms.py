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

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from caesar_yolo_tpu.utils.boxes import iou_matrix

MAX_WH = 7680.0  # class offset multiplier (larger than any letterbox size)
# 512 = 2x the typical crowded-field candidate count at reference
# thresholds; the [K, K] suppression cost is quadratic (1024 costs
# ~3ms/batch-128 extra on v5e), overflow is counted+logged, and
# callers can raise it (--pre_nms) for extreme fields.
DEFAULT_PRE_NMS = 512


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

    # Compact kept rows into a fixed [max_det] output (scatter by rank;
    # overflow beyond max_det lands in a discard row).
    rank = jnp.cumsum(alive) - 1
    dst = jnp.where(alive & (rank < max_det), rank, max_det)
    out_boxes = jnp.zeros((max_det + 1, 4), top_boxes.dtype).at[dst].set(
        top_boxes)[:max_det]
    out_scores = jnp.zeros((max_det + 1,), top_conf.dtype).at[dst].set(
        top_conf)[:max_det]
    out_cls = jnp.zeros((max_det + 1,), jnp.int32).at[dst].set(
        top_cls)[:max_det]
    out_valid = jnp.zeros((max_det + 1,), bool).at[dst].set(
        alive)[:max_det]
    return out_boxes, out_scores, out_cls, out_valid, n_dropped


@partial(jax.jit, static_argnames=("conf_thr", "iou_thr", "max_det",
                                   "pre_nms", "class_agnostic"))
def nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
              conf_thr: float = 0.25, iou_thr: float = 0.5,
              max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
              class_agnostic: bool = False):
    """Batched NMS: boxes [B, A, 4], scores [B, A, NC] ->
    (boxes[B, max_det, 4], scores[B, max_det], cls[B, max_det],
    valid[B, max_det], n_dropped[B])."""
    return jax.vmap(lambda b, s: nms_single(
        b, s, conf_thr=conf_thr, iou_thr=iou_thr, max_det=max_det,
        pre_nms=pre_nms, class_agnostic=class_agnostic))(boxes, scores)
