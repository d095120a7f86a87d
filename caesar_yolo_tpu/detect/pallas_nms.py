"""Pallas TPU kernel for the NMS suppression fixpoint.

The XLA formulation in detect/nms.py materializes the [K, K] IoU matrix
in HBM (K=512 -> 1 MB/image, 134 MB/batch-128) and re-reads it on every
suppression sweep.  Here the whole suppression loop runs VMEM-resident:
one grid step per image loads the K candidate boxes (8 KB), builds the
IoU matrix in VMEM, iterates the greedy fixpoint in VMEM, and writes
back only the K-wide alive mask.  HBM traffic: ~3 MB/batch instead of
~670 MB.

Measured on v5e (in-graph interleaved A/B inside the full detect
program, batch 128): neutral at the default window (K=512: 19.5 vs
19.4 ms/batch) and a clear win at K=1024 (21.4 vs 21.9 ms) where the
quadratic HBM traffic starts to bite — the suppression is
VPU-compute-bound at small K, bandwidth-bound at large K.

Semantics are IDENTICAL to the XLA path (same f32 IoU formula as
utils.boxes.iou_matrix, same strict `iou > thr`, same score-descending
priority via row order) — nms_batch dispatches here on TPU and keeps the
XLA path everywhere else, so CPU tests pin the contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # tests flip this on CPU


def _suppress_kernel(iou_thr, boxes_ref, valid_ref, alive_ref):
    """boxes_ref [1, 8, K] (rows 0..3 = x1, y1, x2, y2; rest padding),
    valid_ref [1, K] f32 (1.0 = candidate), alive_ref [1, K] f32."""
    k = boxes_ref.shape[-1]
    x1 = boxes_ref[0, 0:1, :]          # [1, K]
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    valid_in = valid_ref[0, 0:1, :]    # [1, K]

    def colT(row):                     # [1, K] -> [K, 1]
        return row.reshape(k, 1)

    # pairwise IoU (same op order as utils.boxes.iou_matrix: interW *
    # interH / (areaA + areaB - inter), strict > comparisons downstream)
    ix1 = jnp.maximum(colT(x1), x1)    # [K, K]
    iy1 = jnp.maximum(colT(y1), y1)
    ix2 = jnp.minimum(colT(x2), x2)
    iy2 = jnp.minimum(colT(y2), y2)
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area = (x2 - x1) * (y2 - y1)
    union = colT(area) + area - inter
    iou = inter / jnp.where(union > 0, union, 1.0)
    iou = jnp.where(union > 0, iou, 0.0)

    # masks kept as f32 (Mosaic cannot relayout 1-bit vectors)
    vf = jnp.where(valid_in > 0.5, 1.0, 0.0)        # [1, K]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppress[j, i]: j (higher rank, j < i), if alive, kills i
    suppress = jnp.where(
        (iou > iou_thr) & (row_ids < col_ids)
        & (colT(vf) > 0.5) & (vf > 0.5), 1.0, 0.0)  # [K, K] f32

    def sweep(state):
        alive, _ = state               # alive: [1, K] f32 in {0, 1}
        alive_col = alive.reshape(k, 1)
        killed = jnp.max(suppress * alive_col, axis=0, keepdims=True)
        new_alive = vf * (1.0 - killed)
        changed = jnp.any(new_alive != alive)
        return new_alive, changed

    alive, _ = jax.lax.while_loop(lambda s: s[1], sweep,
                                  (vf, jnp.bool_(True)))
    alive_ref[0, 0:1, :] = alive


@functools.partial(jax.jit, static_argnames=("iou_thr",))
def nms_suppress(boxes_t: jnp.ndarray, valid: jnp.ndarray,
                 iou_thr: float) -> jnp.ndarray:
    """Greedy-NMS alive mask, VMEM-resident.

    boxes_t: [B, 4, K] f32 (x1, y1, x2, y2 rows, score-descending along
    K, class offsets already applied); valid: [B, K] bool.
    Returns alive [B, K] bool.
    """
    b, four, k = boxes_t.shape
    assert four == 4
    # pad K up to the 128-lane tile (arbitrary --pre_nms values, or
    # small img_size where A < pre_nms, give unaligned K that Mosaic
    # cannot relayout); padded columns are valid=False so they never
    # suppress and their alive bits are dropped on the way out
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 0), (0, k_pad - k)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad - k)))
    # pad the tiny sublane dim to the f32 tile height
    boxes_p = jnp.concatenate(
        [boxes_t, jnp.zeros((b, 4, k_pad), boxes_t.dtype)], axis=1)
    valid_f = valid.astype(jnp.float32)[:, None, :]   # [B, 1, K]

    box_spec = pl.BlockSpec((1, 8, k_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    alive = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_thr),
        grid=(b,),
        in_specs=[box_spec, vec_spec],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, k_pad), jnp.float32),
        # the iou + suppress [K, K] f32 pairs are 2 MB at the default
        # K=512 but 32 MB at K=2048 — the crowded-field window the
        # truncation warning steers users toward would blow the 16 MB
        # default scoped-VMEM budget without this (same raise as
        # ops/pallas_stats.py, ops/pallas_clahe.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=INTERPRET,
    )(boxes_p, valid_f)
    return alive[:, 0, :k] > 0.5
