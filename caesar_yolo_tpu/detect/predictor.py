"""Jitted end-to-end detection step: letterbox -> YOLO -> decode -> NMS.

This is the TPU-native replacement for the reference's per-image
`model(image, imgsz, conf, iou)` black box (reference
evaluation.py:181-193): one XLA program per input shape covering
letterboxing, the full network forward (bfloat16 on the MXU with f32
accumulation), DFL decode, fixed-shape NMS, and the inverse letterbox
mapping of surviving boxes.  Batched over tiles so large mosaics keep
the MXU fed.

The reference pipeline feeds float arrays through ultralytics, which
scales them by 1/255 and flips channel order; `input_scale` /
`channel_flip` reproduce that for parity testing but default to
the sane convention (inputs in [0, 1], channels as given).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from caesar_yolo_tpu.detect.letterbox import letterbox_batch, unletterbox_boxes
from caesar_yolo_tpu.detect.nms import DEFAULT_PRE_NMS, nms_batch
from caesar_yolo_tpu.models.layers import fuse_tree
from caesar_yolo_tpu.models.yolo import YOLO, decode_dfl


class Predictor:
    """Compiled batched detector.

    predict_batch(images[B, H, W, C] float32 in [0,1]) ->
      (boxes[B, MAXDET, 4] xyxy in image coords, scores[B, MAXDET],
       class_ids[B, MAXDET], valid[B, MAXDET], n_dropped[B]) as device
    arrays.  n_dropped counts above-threshold candidates truncated by the
    pre_nms window (log-worthy; never silently ignored downstream).
    """

    def __init__(self, model: YOLO, params, *, img_size: int = 640,
                 score_thr: float = 0.7, iou_thr: float = 0.5,
                 max_det: int = 300, pre_nms: int = DEFAULT_PRE_NMS,
                 compute_dtype=jnp.bfloat16, fuse: bool = True,
                 input_scale: float = 1.0, channel_flip: bool = False):
        self.model = model
        self.img_size = img_size
        self.score_thr = score_thr
        self.iou_thr = iou_thr
        self.max_det = max_det
        self.pre_nms = pre_nms
        self.compute_dtype = compute_dtype
        self.input_scale = input_scale
        self.channel_flip = channel_flip
        self._fuse = fuse
        self.params = None
        self.update_params(params)
        self._compiled = {}

    def update_params(self, params):
        """Swap in new weights (same fusing treatment as at construction)
        without recompiling — the compiled programs take params as an
        argument (used by training-time validation on evolving EMA
        weights)."""
        if self._fuse:
            layer_map = {spec.name: spec.module for spec in self.model.layers}
            out = {}
            for name, sub in params.items():
                if name == "head":
                    out[name] = _fuse_head(self.model.head, sub)
                else:
                    out[name] = fuse_tree(layer_map[name], sub)
            params = out
        self.params = jax.device_put(params)

    # -- jit program per input shape -----------------------------------------

    def _build(self, shape):
        b, h, w, c = shape
        S = self.img_size

        # ultralytics pads with 114 BEFORE its unconditional /255; with
        # input_scale set, pad so that pad*input_scale == 114/255.
        from caesar_yolo_tpu.detect.letterbox import PAD_VALUE
        pad = PAD_VALUE / self.input_scale

        @jax.jit
        def step(params, images):
            x = letterbox_batch(images.astype(jnp.float32), S, pad_value=pad)
            if self.channel_flip:
                x = x[..., ::-1]
            if self.input_scale != 1.0:
                x = x * self.input_scale
            x = x.astype(self.compute_dtype)
            raw = self.model(params, x)
            boxes, scores = decode_dfl(raw, S)
            bsel, ssel, csel, vsel, ndrop = nms_batch(
                boxes, scores, conf_thr=self.score_thr, iou_thr=self.iou_thr,
                max_det=self.max_det, pre_nms=self.pre_nms)
            bsel = unletterbox_boxes(bsel, h, w, S)
            return bsel, ssel, csel, vsel, ndrop

        return step

    def predict_batch(self, images):
        """images: [B, H, W, C] array -> device-array detection tuple."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        shape = tuple(images.shape)
        if shape not in self._compiled:
            self._compiled[shape] = self._build(shape)
        return self._compiled[shape](self.params, images)

    def predict_image(self, image):
        """Single [H, W, C] image -> host numpy (boxes[N,4], scores[N],
        class_ids[N]) with padding stripped."""
        bsel, ssel, csel, vsel, ndrop = self.predict_batch(image)
        n_dropped = int(np.asarray(ndrop[0]))
        if n_dropped:
            from caesar_yolo_tpu import logger
            logger.warning(
                "NMS pre-filter dropped %d above-threshold candidates "
                "(pre_nms=%d too small for this field; raise it)",
                n_dropped, self.pre_nms)
        v = np.asarray(vsel[0])
        return (np.asarray(bsel[0])[v], np.asarray(ssel[0])[v],
                np.asarray(csel[0])[v])


def _fuse_head(head, params):
    """Fold BN in the detect-head Conv blocks."""
    out = {"box": [], "cls": []}
    for branch, modules_per_level in (("box", head.box_branches),
                                      ("cls", head.cls_branches)):
        for level_params, modules in zip(params[branch], modules_per_level):
            fused = [m.fuse(p) if hasattr(m, "fuse") else p
                     for m, p in zip(modules, level_params)]
            out[branch].append(fused)
    return out
