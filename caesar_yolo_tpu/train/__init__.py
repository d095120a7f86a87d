"""Training: detection loss (TAL/CIoU/DFL), optax loop, checkpoints."""

from caesar_yolo_tpu.train.loss import (
    bbox2dist,
    ciou,
    detection_loss,
    dfl_loss,
    dist2bbox,
    task_aligned_assigner,
)
from caesar_yolo_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    TrainState,
    make_optimizer,
)
