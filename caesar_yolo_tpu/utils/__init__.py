"""Core utilities: FITS I/O, box math, union-find, tile grids."""

from caesar_yolo_tpu.utils.boxes import (
    get_iou,
    get_merged_bbox,
    iou_matrix,
    iou_matrix_np,
    xywh2xyxy,
    xyxy2xywh,
)
from caesar_yolo_tpu.utils.fits import (
    FitsHeader,
    Wcs,
    beam_area_from_header,
    get_fits_header,
    get_fits_size,
    read_fits,
    read_fits_crop,
    read_image,
    strip_deg_axis_from_header,
    write_fits,
)
from caesar_yolo_tpu.utils.misc import (
    apply_mask,
    compose_fcns,
    read_filelist,
    read_table,
    set_type,
    to_uint8,
)
from caesar_yolo_tpu.utils.resize import (
    resize_img,
    resize_img_v2,
    resize_mask,
)
from caesar_yolo_tpu.utils.tiling import (
    TileWindow,
    generate_tiles,
    make_tile_windows,
    neighbor_table,
)
from caesar_yolo_tpu.utils.unionfind import UnionFind, connected_components
