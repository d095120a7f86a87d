"""Distribution layer: device mesh, sharded tile engine, stitching,
mosaic orchestration."""

from caesar_yolo_tpu.parallel.engine import TileEngine, fuse_model_params
from caesar_yolo_tpu.parallel.mesh import (
    TILE_AXIS,
    batch_sharding,
    initialize_distributed,
    local_mesh,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
)
from caesar_yolo_tpu.parallel.sfinder import SFinder, SFinderConfig, SFinderReport
from caesar_yolo_tpu.parallel.stitch import flag_edge_sources, stitch_tile_sources
