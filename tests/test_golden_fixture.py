"""Torch-free parity against a RECORDED torch-oracle catalog.

tests/fixtures/golden_galaxy0001_torch.json was produced by a live
run of the published-ultralytics torch pipeline (tests/ultra_ref.py,
the black box behind reference evaluation.py:181-193) on
/root/reference/test/galaxy0001.fits with the checked-in converted twin
weights (scripts/make_golden_fixture.py).  This test re-runs ONLY the
JAX pipeline and matches it against that recording — so the
torch-parity claim stays re-checkable in environments without torch
(VERDICT r3 next-round #7).

Unlike test_pipeline_parity.py (which needs torch live and regenerates
the oracle), this catches any drift in OUR pipeline — letterbox,
channel flip, decode, NMS, scale-back — against a frozen ground truth.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDEN = os.path.join(FIXDIR, "golden_galaxy0001_torch.json")
WEIGHTS = os.path.join(FIXDIR, "twin_v8n_seed0.npz")
FITS = "/root/reference/test/galaxy0001.fits"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(WEIGHTS)
         and os.path.exists(FITS)),
    reason="golden fixture or reference image not available")


def test_jax_pipeline_matches_recorded_torch_catalog():
    from caesar_yolo_tpu.detect.predictor import Predictor
    from caesar_yolo_tpu.models.convert import load_params
    from caesar_yolo_tpu.models.yolo import build_model
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils.boxes import iou_matrix_np
    from caesar_yolo_tpu.utils.fits import read_fits

    g = json.loads(open(GOLDEN).read())
    tb = np.asarray(g["boxes"], np.float32)
    ts = np.asarray(g["scores"], np.float32)
    tc = np.asarray(g["classes"], np.int32)
    assert len(ts) >= 10

    data = np.asarray(read_fits(FITS)[0], np.float32)
    img = np.repeat(data[:, :, None], 3, axis=-1)
    pp = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    out, valid = pp(img)
    assert bool(valid)
    img = np.asarray(out, np.float32)

    params, meta = load_params(WEIGHTS)
    model = build_model(meta["model"], num_classes=int(meta["num_classes"]))
    S = int(g["img_size"])
    n_anchors = (S // 8) ** 2 + (S // 16) ** 2 + (S // 32) ** 2
    pred = Predictor(model, params, img_size=S,
                     score_thr=float(g["conf_thr"]),
                     iou_thr=float(g["iou_thr"]), pre_nms=n_anchors,
                     compute_dtype=jnp.float32, input_scale=1 / 255.0,
                     channel_flip=True)
    jb, js, jc = pred.predict_image(img)

    # the parity rule of test_pipeline_parity.assert_catalogs_match,
    # with the golden boxes rounded to 1e-4 at recording time
    assert len(js) == len(ts), f"count mismatch: {len(js)} vs {len(ts)}"
    used = np.zeros(len(ts), bool)
    for i in range(len(js)):
        iou = iou_matrix_np(jb[i:i + 1], tb)[0]
        cand = ((iou >= 0.99) & (tc == jc[i])
                & (np.abs(ts - js[i]) <= 1e-3) & ~used)
        assert cand.any(), (
            f"jax det {i} (box={jb[i]}, score={js[i]:.4f}, cls={jc[i]}) "
            f"has no recorded-oracle partner (best IoU {iou.max():.4f})")
        used[int(np.argmax(cand))] = True
