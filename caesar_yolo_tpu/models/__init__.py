"""YOLOv8 / YOLO11 models: blocks, graphs, decode, weight conversion."""

from caesar_yolo_tpu.models.yolo import (
    REG_MAX,
    STRIDES,
    YOLO,
    anchor_points,
    build_model,
    count_params,
    decode_dfl,
    init_params,
)
