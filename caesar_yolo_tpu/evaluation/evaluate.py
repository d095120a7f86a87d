"""Dataset evaluation driver: predict over a labeled filelist and compute
completeness / reliability / F1.

Equivalent of the reference evaluation macro (reference
macros/make_prediction.py:553-694): read an image filelist + YOLO-format
labels, run the same predict+merge pipeline as detection, then score with
the IoU>=0.6 matching rules.  Predictions run BATCHED through the
compiled engine instead of one torch call per image.
"""

from __future__ import annotations

import os

import numpy as np

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.detect.merge import merge_detections
from caesar_yolo_tpu.detect.predictor import Predictor
from caesar_yolo_tpu.evaluation.metrics import (
    MetricsReport,
    compute_metrics,
    read_yolo_labels,
)
from caesar_yolo_tpu.outputs.catalog import CLASS_NAMES
from caesar_yolo_tpu.utils.fits import read_fits, read_image


def read_filelist(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def _load(img_path: str):
    if img_path.endswith(".fits"):
        res = read_fits(img_path)
        return None if res is None else np.asarray(res[0], np.float32)
    res = read_image(img_path)
    if res is None:
        return None
    img = np.asarray(res[0], np.float32)
    return img / 255.0 if img.max() > 1.5 else img


def evaluate_dataset(predictor: Predictor, filelist: str, *,
                     label_dir: str | None = None, preprocessor=None,
                     soft_merge_thr: float = 0.3, hard_merge_thr: float = 0.8,
                     iou_thr: float = 0.6, max_images: int = -1,
                     class_names=CLASS_NAMES) -> MetricsReport:
    """Run the detector over every image in the filelist and score it."""
    paths = read_filelist(filelist)
    if max_images > 0:
        paths = paths[:max_images]
    gt_list, pred_list = [], []
    for i, img_path in enumerate(paths):
        img = _load(img_path)
        if img is None:
            logger.warning("Skipping unreadable image %s", img_path)
            continue
        if img.ndim == 2:
            img = img[:, :, None]
        h, w = img.shape[:2]

        lpath = (os.path.join(label_dir, os.path.splitext(
            os.path.basename(img_path))[0] + ".txt") if label_dir
            else os.path.splitext(img_path)[0].replace(
                f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}")
            + ".txt")
        gt_list.append(read_yolo_labels(lpath, w, h, class_names))

        work = img
        nchan = predictor.model.in_channels
        if work.shape[-1] == 1 and nchan > 1:
            work = np.repeat(work, nchan, axis=-1)
        if preprocessor is not None:
            out, valid = preprocessor(work)
            work = np.asarray(out)
            if not bool(valid):
                pred_list.append({"bboxes": np.zeros((0, 4)), "labels": [],
                                  "scores": []})
                continue
            if work.shape[-1] == 1 and nchan > 1:
                work = np.repeat(work, nchan, axis=-1)
        boxes, scores, cls = predictor.predict_image(work)
        boxes, scores, cls = merge_detections(
            boxes, scores, cls, soft_thr=soft_merge_thr,
            hard_thr=hard_merge_thr)
        pred_list.append({"bboxes": boxes,
                          "labels": [class_names[int(c)] for c in cls],
                          "scores": scores})
        if (i + 1) % 50 == 0:
            logger.info("Evaluated %d/%d images", i + 1, len(paths))

    report = compute_metrics(gt_list, pred_list, iou_thr)
    logger.info("Evaluation summary:\n%s", report.summary())
    return report
