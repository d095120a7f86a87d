"""Per-image detection orchestration (the reference's Analyzer).

Mirrors reference evaluation.py:38-346: grayscale->3-channel replication,
preprocessing, degenerate-channel guard, prediction, graph-based overlap
merge, and the JSON/DS9/FITS/plot output fan-out.  The prediction itself
runs through the compiled `Predictor` (one jitted XLA program) instead of
a per-image torch dispatch.

Reference quirk fixed (documented SURVEY.md quirks): the degenerate-data
guard indexes image ROWS (`self.image[i]` for i in range(nchans),
reference evaluation.py:168-176); here each CHANNEL is checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.detect.merge import merge_detections
from caesar_yolo_tpu.detect.predictor import Predictor
from caesar_yolo_tpu.outputs.catalog import (
    CLASS_NAMES,
    make_json_results,
    make_objects,
    write_json,
)
from caesar_yolo_tpu.outputs.ds9 import write_ds9_regions
from caesar_yolo_tpu.utils.fits import write_fits


@dataclass
class AnalyzerOutputs:
    """Per-image output toggles/paths (reference CONFIG keys,
    config.py:39-56)."""
    write_json: bool = True
    write_ds9: bool = True
    save_img: bool = False
    draw: bool = False
    save_plot: bool = False
    draw_class_label_in_caption: bool = True
    outfile_json: str = ""
    outfile_ds9: str = ""
    outfile_img: str = ""
    outfile_plot: str = ""


@dataclass
class Detections:
    """Final per-image detections, local image coords."""
    boxes: np.ndarray = field(default_factory=lambda: np.zeros((0, 4)))
    scores: np.ndarray = field(default_factory=lambda: np.zeros((0,)))
    class_ids: np.ndarray = field(
        default_factory=lambda: np.zeros((0,), np.int64))

    def __len__(self):
        return len(self.scores)


class Analyzer:
    """Single-image detection engine.

    predict(image, image_id, xmin=0, ymin=0) runs preprocess -> detector
    -> merge -> outputs; results land in `self.detections` /
    `self.results` (catalog dict), as in the reference (self.bboxes_final
    etc., reference evaluation.py:341-344).
    """

    def __init__(self, predictor: Predictor, *, preprocessor=None,
                 soft_merge_thr: float = 0.3, hard_merge_thr: float = 0.8,
                 outputs: AnalyzerOutputs | None = None,
                 class_names=CLASS_NAMES, obj_name_tag: str = ""):
        self.predictor = predictor
        self.preprocessor = preprocessor
        self.soft_merge_thr = soft_merge_thr
        self.hard_merge_thr = hard_merge_thr
        self.outputs = outputs or AnalyzerOutputs()
        self.class_names = class_names
        self.obj_name_tag = obj_name_tag
        self.detections = Detections()
        self.results: dict = {}
        self.image = None

    def prepare_image(self, image) -> np.ndarray | None:
        """Replicate grayscale to the model's channel count, run the
        preprocessing pipeline, and apply the degenerate-data guard.
        Returns None when the image cannot be predicted on (the
        reference's no-prediction paths, evaluation.py:146-176)."""
        img = np.asarray(image, dtype=np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        nchan = self.predictor.model.in_channels
        if img.shape[-1] == 1 and nchan > 1:
            img = np.repeat(img, nchan, axis=-1)

        if self.preprocessor is not None:
            # batch-of-one through the compiled batch path: stages with
            # native Pallas batch kernels (hist-eq/CLAHE/sigma-clip)
            # must not take their per-image XLA formulations on TPU
            out, valid = self.preprocessor.apply_one(img)
            if not bool(valid):
                logger.warning("Preprocessing marked image invalid, "
                               "skipping prediction")
                return None
            img = np.asarray(out)
            if img.shape[-1] == 1 and nchan > 1:
                img = np.repeat(img, nchan, axis=-1)

        # degenerate-channel guard: all-equal channel -> no prediction
        for ch in range(img.shape[-1]):
            cmin, cmax = img[:, :, ch].min(), img[:, :, ch].max()
            if cmin == cmax:
                logger.warning("Channel %d is degenerate (min==max==%f), "
                               "skipping prediction", ch, float(cmin))
                return None
        return img

    def predict(self, image, image_id="", *, xmin: float = 0,
                ymin: float = 0) -> int:
        """Full per-image pipeline.  Returns 0 on success, -1 when the
        image was skipped (degenerate/invalid), matching the reference's
        status-code convention (evaluation.py:194-196)."""
        img = self.prepare_image(image)
        if img is None:
            self.detections = Detections()
            self.results = make_json_results(image_id, [])
            return -1
        self.image = img

        boxes, scores, class_ids = self.predictor.predict_image(img)
        boxes, scores, class_ids = merge_detections(
            boxes, scores, class_ids,
            soft_thr=self.soft_merge_thr, hard_thr=self.hard_merge_thr)
        self.detections = Detections(boxes, scores, class_ids)

        objs = make_objects(boxes, scores, class_ids,
                            image_shape=img.shape, xmin=xmin, ymin=ymin,
                            name_tag=self.obj_name_tag,
                            class_names=self.class_names)
        self.results = make_json_results(image_id, objs)
        self._write_outputs(image_id, objs)
        return 0

    def _write_outputs(self, image_id, objs):
        o = self.outputs
        if o.write_json:
            write_json(self.results,
                       o.outfile_json or f"out_{image_id}.json")
        if o.write_ds9:
            write_ds9_regions(objs, o.outfile_ds9 or f"out_{image_id}.reg")
        if o.save_img and self.image is not None:
            write_fits(self.image[:, :, 0],
                       o.outfile_img or f"out_{image_id}.fits")
        if o.draw:
            from caesar_yolo_tpu.outputs.plot import draw_results
            # plot in LOCAL image coords (objs carry the mosaic offset)
            d = self.detections
            local = [{**obj,
                      "x1": d.boxes[i][0], "y1": d.boxes[i][1],
                      "x2": d.boxes[i][2], "y2": d.boxes[i][3]}
                     for i, obj in enumerate(objs)]
            draw_results(self.image, local,
                         o.outfile_plot or f"out_{image_id}.png",
                         draw_class_label_in_caption=
                         o.draw_class_label_in_caption,
                         show=not o.save_plot)
