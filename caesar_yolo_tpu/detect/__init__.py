"""Detection engine: letterbox, decode, fixed-shape NMS, graph merge."""

from caesar_yolo_tpu.detect.letterbox import (
    letterbox,
    letterbox_batch,
    letterbox_geometry,
    unletterbox_boxes,
)
from caesar_yolo_tpu.detect.analyzer import Analyzer, AnalyzerOutputs, Detections
from caesar_yolo_tpu.detect.batch import BatchedDetector
from caesar_yolo_tpu.detect.merge import merge_detections
from caesar_yolo_tpu.detect.nms import nms_batch, nms_single
from caesar_yolo_tpu.detect.predictor import Predictor
