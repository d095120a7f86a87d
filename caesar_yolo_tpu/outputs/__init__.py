"""Output writers: JSON catalogs, DS9 regions, annotated plots."""

from caesar_yolo_tpu.outputs.catalog import (
    CLASS_COLOR_MAP,
    CLASS_COLOR_MAP_DS9,
    CLASS_NAMES,
    NumpyJSONEncoder,
    make_json_results,
    make_objects,
    write_json,
)
from caesar_yolo_tpu.outputs.ds9 import region_line, write_ds9_regions
