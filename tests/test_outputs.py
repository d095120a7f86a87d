"""Output-writer tests: DS9 region math, JSON encoder, catalog edges."""

import json

import numpy as np

from caesar_yolo_tpu.outputs import (
    NumpyJSONEncoder,
    make_json_results,
    make_objects,
    region_line,
    write_json,
)


def test_region_line_geometry():
    obj = {"name": "S1", "x1": 10.0, "x2": 30.0, "y1": 20.0, "y2": 60.0,
           "class_name": "compact", "edge": 1}
    line = region_line(obj)
    # DS9 centers are 1-based: xc = 10 + 10 + 1 = 21, yc = 20 + 20 + 1 = 41
    assert line.startswith("box(21,41,20,40,0)")
    assert "color=blue" in line and "text={S1}" in line
    assert "tag={compact}" in line and "tag={BORDER}" in line
    assert "MERGED" not in line


def test_region_line_merged_tag():
    obj = {"name": "S2", "x1": 0, "x2": 2, "y1": 0, "y2": 2,
           "class_name": "extended", "edge": 1, "merged": True}
    line = region_line(obj)
    assert "tag={MERGED}" in line and "color=green" in line


def test_mosaic_reg_bytes_match_reference_palette(tmp_path):
    """Stitched mosaic .reg uses the reference SFinder palette
    (reference inference.py:334-342: yellow extended-multisland, black
    flagged, diffuse present), NOT the per-tile Analyzer palette
    (evaluation.py:108-115).  Byte-compare against hand-written lines."""
    from caesar_yolo_tpu.outputs.catalog import CLASS_COLOR_MAP_DS9_MOSAIC
    from caesar_yolo_tpu.outputs.ds9 import write_ds9_regions

    objs = [
        {"name": "S1", "x1": 10.0, "x2": 30.0, "y1": 20.0, "y2": 60.0,
         "class_name": "extended-multisland", "edge": 0, "merged": True},
        {"name": "S2", "x1": 0.0, "x2": 4.0, "y1": 0.0, "y2": 4.0,
         "class_name": "flagged", "edge": 1},
        {"name": "S3", "x1": 5.0, "x2": 9.0, "y1": 5.0, "y2": 9.0,
         "class_name": "diffuse", "edge": 0},
    ]
    out = tmp_path / "mosaic.reg"
    write_ds9_regions(objs, str(out),
                      color_map=CLASS_COLOR_MAP_DS9_MOSAIC)
    expect = (
        "# Region file format: DS9 astropy/regions\n"
        "image\n"
        "box(21,41,20,40,0) # color=yellow text={S1}"
        " tag={extended-multisland} tag={MERGED}\n"
        "box(3,3,4,4,0) # color=black text={S2}"
        " tag={flagged} tag={BORDER}\n"
        "box(8,8,4,4,0) # color=magenta text={S3} tag={diffuse}\n"
    )
    assert out.read_text() == expect
    # the per-tile Analyzer palette is unchanged
    line = region_line(objs[0])
    assert "color=orange" in line


def test_make_objects_edge_flag_and_offsets():
    boxes = np.asarray([[0.0, 5.0, 20.0, 30.0], [40.0, 40.0, 60.0, 60.0]])
    objs = make_objects(boxes, [0.9, 0.8], [1, 2], image_shape=(100, 100),
                        xmin=1000, ymin=2000, name_tag="t7")
    assert objs[0]["name"] == "S1_t7"
    assert objs[0]["edge"] == 1      # x1 == 0 touches the bound
    assert objs[1]["edge"] == 0
    assert objs[0]["x1"] == 1000.0 and objs[0]["y1"] == 2005.0
    assert objs[1]["class_name"] == "extended"


def test_numpy_json_encoder(tmp_path):
    results = make_json_results("img", [{
        "a": np.int64(3), "b": np.float32(0.5), "c": np.bool_(True),
        "d": np.asarray([1, 2]),
    }])
    out = tmp_path / "o.json"
    write_json(results, str(out))
    back = json.loads(out.read_text())
    assert back["objs"][0] == {"a": 3, "b": 0.5, "c": True, "d": [1, 2]}
