"""Generate the checked-in torch-oracle golden catalog fixture.

Runs the published-ultralytics torch oracle (tests/ultra_ref.py — the
black box behind the reference's `model(image, ...)` call, reference
evaluation.py:181-193) on /root/reference/test/galaxy0001.fits with the
calibrated seed-0 twin, and records:

  tests/fixtures/twin_v8n_seed0.npz        converted twin weights
  tests/fixtures/golden_galaxy0001_torch.json
      the torch catalog (boxes/scores/classes) + the stable-gap
      thresholds it was produced at

so pipeline parity against a REAL torch run stays re-checkable in
torch-less environments (tests/test_golden_fixture.py).  Regenerate
only when the oracle methodology changes:

    python scripts/make_golden_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

IMG_SIZE = 192
SEED = 0
FITS = "/root/reference/test/galaxy0001.fits"


def main() -> int:
    import torch
    import jax.numpy as jnp
    import ultra_ref as U
    from test_pipeline_parity import (
        assert_catalogs_match, convert_twin, jax_decode_conf, n_anchors,
        pick_iou_threshold, pick_threshold, assert_order_consistent)
    from caesar_yolo_tpu.detect.predictor import Predictor
    from caesar_yolo_tpu.models.convert import save_params
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils.fits import read_fits

    data = np.asarray(read_fits(FITS)[0], np.float32)
    img = np.repeat(data[:, :, None], 3, axis=-1)
    pp = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    out, valid = pp(img)
    assert bool(valid)
    img = np.asarray(out, np.float32)

    lb, _, _, _ = U.ultra_letterbox(img, IMG_SIZE)
    t = torch.from_numpy(np.ascontiguousarray(
        lb[:, :, ::-1].transpose(2, 0, 1)))[None] / 255.0
    tm = U.build_torch_twin("yolov8n", seed=SEED, calib=t)
    with torch.no_grad():
        raw = tm(t)
    boxes_all, scores_all = U.ultra_decode(raw)
    conf_thr = pick_threshold(scores_all)
    iou_thr = pick_iou_threshold(boxes_all, scores_all, conf_thr, 0.5)
    tb, ts, tc = U.ultra_pipeline(tm, img, IMG_SIZE, conf_thr, iou_thr)

    # convert + verify live parity before pinning the fixture
    jm, params = convert_twin(tm, "yolov8n")
    assert_order_consistent(scores_all.max(axis=1),
                            jax_decode_conf(jm, params, img, IMG_SIZE),
                            conf_thr, boxes_all, scores_all, iou_thr)
    pred = Predictor(jm, params, img_size=IMG_SIZE, score_thr=conf_thr,
                     iou_thr=iou_thr, pre_nms=n_anchors(IMG_SIZE),
                     compute_dtype=jnp.float32, input_scale=1 / 255.0,
                     channel_flip=True)
    assert_catalogs_match(pred.predict_image(img), (tb, ts, tc))

    fixdir = os.path.join(REPO, "tests", "fixtures")
    save_params(params, os.path.join(fixdir, "twin_v8n_seed0.npz"),
                meta={"model": "yolov8n", "num_classes": 5})
    with open(os.path.join(fixdir, "golden_galaxy0001_torch.json"),
              "w") as f:
        json.dump({
            "image": os.path.basename(FITS),
            "preprocessing": "zscale_stretch+normalize_minmax",
            "model": "yolov8n", "seed": SEED, "img_size": IMG_SIZE,
            "conf_thr": conf_thr, "iou_thr": iou_thr,
            "torch": torch.__version__,
            "boxes": np.asarray(tb, float).round(4).tolist(),
            "scores": np.asarray(ts, float).round(6).tolist(),
            "classes": np.asarray(tc, int).tolist(),
        }, f, indent=1)
    print(f"golden fixture written: {len(ts)} detections, "
          f"conf_thr={conf_thr:.5f}, iou_thr={iou_thr:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
