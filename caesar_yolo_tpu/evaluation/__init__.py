"""Dataset-quality evaluation: completeness / reliability / F1 / mAP."""

from caesar_yolo_tpu.evaluation.evaluate import evaluate_dataset, read_filelist
from caesar_yolo_tpu.evaluation.metrics import (
    ClassCounts,
    MAPReport,
    MetricsReport,
    SOURCE_CLASSES,
    SPECIAL_CLASSES,
    compute_completeness,
    compute_map,
    compute_metrics,
    compute_reliability,
    read_yolo_labels,
)
