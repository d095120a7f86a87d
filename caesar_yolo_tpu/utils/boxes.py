"""Bounding-box math: vectorized IoU and enclosing boxes.

The reference computes IoU scalar-pairwise in Python (utils.py:54-107) and
the enclosing box of a set (utils.py:110-119); here both are vectorized
(numpy for host-side merge/stitch code, jnp for on-device NMS).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_iou(bb1, bb2) -> float:
    """IoU of two xyxy boxes (semantics of reference utils.py:54-107).

    Degenerate boxes (x1>=x2 or y1>=y2) yield 0 instead of asserting.
    """
    m = iou_matrix_np(np.asarray(bb1, dtype=np.float64)[None, :],
                      np.asarray(bb2, dtype=np.float64)[None, :])
    return float(m[0, 0])


def iou_matrix_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix [N,M] for xyxy boxes (numpy, host side)."""
    boxes1 = np.asarray(boxes1, dtype=np.float64)
    boxes2 = np.asarray(boxes2, dtype=np.float64)
    x11, y11, x12, y12 = [boxes1[:, i][:, None] for i in range(4)]
    x21, y21, x22, y22 = [boxes2[:, i][None, :] for i in range(4)]
    iw = np.minimum(x12, x22) - np.maximum(x11, x21)
    ih = np.minimum(y12, y22) - np.maximum(y11, y21)
    # Reference counts zero-width touching boxes (x_right == x_left) as
    # intersecting with area 0 -> IoU 0; negative extents mean no overlap.
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    a1 = np.clip(x12 - x11, 0, None) * np.clip(y12 - y11, 0, None)
    a2 = np.clip(x22 - x21, 0, None) * np.clip(y22 - y21, 0, None)
    union = a1 + a2 - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [N,M] for xyxy boxes (jnp, jit-safe)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    iw = jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0])
    ih = jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1])
    inter = jnp.clip(iw, 0, None) * jnp.clip(ih, 0, None)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def get_merged_bbox(bboxes) -> tuple:
    """Enclosing box of a list of xyxy boxes (reference utils.py:110-119)."""
    x = np.asarray(bboxes)
    return (x[:, 0].min(), x[:, 1].min(), x[:, 2].max(), x[:, 3].max())


def boxes_overlap_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise closed-interval overlap predicate [N,M].

    Matches the reference's stitch-time check (inference.py:796-801):
    boxes sharing only an edge/corner DO overlap (<=/>= comparisons).
    """
    boxes1 = np.asarray(boxes1, dtype=np.float64)
    boxes2 = np.asarray(boxes2, dtype=np.float64)
    not_olap = (
        (boxes1[:, None, 2] < boxes2[None, :, 0])
        | (boxes1[:, None, 0] > boxes2[None, :, 2])
        | (boxes1[:, None, 3] < boxes2[None, :, 1])
        | (boxes1[:, None, 1] > boxes2[None, :, 3])
    )
    return ~not_olap


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """Convert (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """Convert (x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)
