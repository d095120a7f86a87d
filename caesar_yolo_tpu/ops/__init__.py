"""Preprocessing ops: masked stats, zscale, histogram equalization,
and the 20 reference transforms as pure jit-able functions."""

from caesar_yolo_tpu.ops.clahe import equalize_adapthist
from caesar_yolo_tpu.ops.histeq import equalize_hist
from caesar_yolo_tpu.ops.stats import (
    masked_max,
    masked_min,
    sigma_clip_bounds,
    sigma_clipped_stats,
)
from caesar_yolo_tpu.ops.transforms import (
    Pipeline,
    abs_max_scaler,
    abs_min_max_normalizer,
    bkg_subtractor,
    border_masker,
    build_preprocessor,
    chan3_transformer,
    chan_divider,
    chan_max_scaler,
    chan_resizer,
    hist_equalizer,
    log_stretcher,
    max_scaler,
    min_max_normalizer,
    min_shifter,
    negative_data_fixer,
    resizer,
    scaler,
    shifter,
    sigma_clip_shifter,
    sigma_clipper,
    standardizer,
    valid_mask,
    zscale_transformer,
)
from caesar_yolo_tpu.ops.zscale import zscale_limits, zscale_transform
