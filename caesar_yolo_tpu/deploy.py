"""Serving export: compile the detection step once, serialize it, run it
anywhere — without the model-building code or the weight files.

The reference has no deployment story beyond shipping `.pt` files plus
the full ultralytics+torch stack (reference README.md "Run" section);
serving a caesar-yolo model means re-installing the training framework.
Here the TPU-native equivalent of a frozen servable is a `jax.export`
artifact: the whole detect step (preprocess -> letterbox -> YOLO forward
(bf16) -> DFL decode -> fixed-shape NMS -> inverse letterbox) is traced,
lowered to StableHLO with the fused weights embedded as constants, and
serialized to one portable blob.  A serving process deserializes the
blob and calls it — no `models/`, no `ops/`, no weight loading, and
guaranteed-identical numerics to the compile it was exported from.

Typical flow:

    blob = export_detector(model, params, preprocessor=pipe,
                           tile_shape=(640, 640, 1), batch=128)
    Path("detector.cyx").write_bytes(blob)
    # ... in the serving process (any machine with jax + the platform):
    det = load_detector(Path("detector.cyx").read_bytes())
    boxes, scores, cls_ids, valid, tile_ok, n_dropped = det(tiles)

Notes:
  - Fixed shapes by design (the framework's static-shape contract): one
    artifact per (batch, tile_shape).  Export several for several tile
    grids; the blob is small (weights dominate).
  - `platforms` defaults to the exporting machine's backend; pass e.g.
    ("tpu", "cpu") for an artifact that can also run on CPU fallback
    hosts (cross-platform lowering is a jax.export feature — the TPU
    branch still uses the TPU-tuned program).
  - The NMS suppression runs the XLA sweep formulation (identical
    semantics to the Pallas kernel, tests/test_pallas_nms.py) so the
    artifact stays portable across platforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from caesar_yolo_tpu.detect.nms import DEFAULT_PRE_NMS
from caesar_yolo_tpu.models.yolo import YOLO
from caesar_yolo_tpu.parallel.engine import fuse_model_params, make_tile_step


def build_serving_step(model: YOLO, params, *, preprocessor=None,
                       img_size: int = 640, score_thr: float = 0.25,
                       iou_thr: float = 0.5, max_det: int = 300,
                       pre_nms: int = DEFAULT_PRE_NMS,
                       compute_dtype=jnp.bfloat16, fuse: bool = True):
    """The TileEngine step closed over fused weights: tiles[B, H, W, C]
    -> (boxes[B, max_det, 4] in tile coords, scores, cls, valid,
    tile_ok[B], n_dropped[B]).  LITERALLY the engine's step — both call
    parallel.engine.make_tile_step, so serving and the live engine
    cannot drift (parity additionally pinned by tests/test_deploy.py)."""
    if fuse:
        params = fuse_model_params(model, params)
    step = make_tile_step(
        model, preprocessor=preprocessor, img_size=img_size,
        score_thr=score_thr, iou_thr=iou_thr, max_det=max_det,
        pre_nms=pre_nms, compute_dtype=compute_dtype)

    def serve(tiles):
        return step(params, tiles)

    return serve


def export_detector(model: YOLO, params, *, tile_shape, batch: int,
                    preprocessor=None, img_size: int = 640,
                    score_thr: float = 0.25, iou_thr: float = 0.5,
                    max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
                    compute_dtype=jnp.bfloat16, fuse: bool = True,
                    platforms=None, in_dtype=jnp.float32) -> bytes:
    """Serialize the full detect step for `batch` tiles of `tile_shape`
    (H, W, C) into a portable StableHLO artifact with weights embedded.

    `platforms`: lowering targets, e.g. ("tpu", "cpu"); None = the
    current default backend only.
    """
    from caesar_yolo_tpu.detect.nms import portable_suppression

    step = build_serving_step(
        model, params, preprocessor=preprocessor, img_size=img_size,
        score_thr=score_thr, iou_thr=iou_thr, max_det=max_det,
        pre_nms=pre_nms, compute_dtype=compute_dtype, fuse=fuse)
    spec = jax.ShapeDtypeStruct((batch, *tile_shape), in_dtype)
    with portable_suppression():
        # trace with the XLA suppression formulation even on a TPU host:
        # a baked-in Mosaic kernel would not lower for other platforms
        exp = jax_export.export(jax.jit(step),
                                platforms=platforms)(spec)
    return bytes(exp.serialize())


def load_detector(blob: bytes):
    """Deserialize an export_detector artifact into a callable
    tiles[B, H, W, C] -> detection tuple (shapes fixed at export)."""
    exp = jax_export.deserialize(blob)
    return jax.jit(exp.call)
