"""int8 PTQ (models/quant.py): conv-level dequant accuracy, structural
skip rules, and end-to-end detection quality with trained weights."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.layers import Conv
from caesar_yolo_tpu.models.yolo import DWConv
from caesar_yolo_tpu.models.quant import (calibration_inputs_from_tiles,
                                          quantize_model)
from caesar_yolo_tpu.models.yolo import build_model, init_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov8n_synth96.npz")


def test_quantized_conv_close_to_float(rng):
    conv = Conv(16, 32, 3)
    params = conv.init(jax.random.PRNGKey(0))
    params["bn"]["mean"] = jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
    params["bn"]["var"] = jnp.asarray(rng.random(32) + 0.5, jnp.float32)
    fused = conv.fuse(params)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 24, 16)), jnp.float32)

    ref = conv(fused, x)
    from caesar_yolo_tpu.models.quant import _quantize_conv
    q = _quantize_conv(conv, fused, float(jnp.max(jnp.abs(x))))
    got = conv(q, x)
    # 8-bit symmetric: error bounded by a small fraction of the output
    # range, not bitwise
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.02 * scale, f"quant error {err} vs range {scale}"


def test_quantize_model_skip_rules(rng):
    model = build_model("yolo11n", num_classes=5)  # has DWConv + attention
    params = init_params(model, 0)
    xx = [jnp.asarray(rng.random((1, 64, 64, 3), np.float32))]
    q = quantize_model(model, params, xx)

    n_q, n_f = [0], [0]

    def walk(t):
        if isinstance(t, dict):
            if "wq" in t:
                n_q[0] += 1
                assert t["wq"].dtype == jnp.int8
            elif "w" in t:
                n_f[0] += 1
            for v in t.values():
                walk(v)
        elif isinstance(t, list):
            for v in t:
                walk(v)

    walk(q)
    assert n_q[0] > 30, f"only {n_q[0]} convs quantized"
    assert n_f[0] > 0, "depthwise/head-final convs must stay float"

    # grouped convs stay float: find one DWConv param in the head
    head_cls = q["head"]["cls"][0]
    modules = model.head.cls_branches[0]
    for m, p in zip(modules, head_cls):
        if isinstance(m, DWConv):
            assert "wq" not in p


def test_quantized_forward_runs_all_models(rng):
    for name in ("yolov8n", "yolo11n"):
        model = build_model(name, num_classes=5)
        params = init_params(model, 0)
        xx = [jnp.asarray(rng.random((1, 64, 64, 3), np.float32))]
        q = quantize_model(model, params, xx)
        raw = jax.jit(lambda p, x: model(p, x))(q, xx[0])
        for (box, cls) in raw:
            assert np.isfinite(np.asarray(box, np.float32)).all()


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="trained fixture weights not built")
def test_quantized_detection_quality(rng):
    """Trained detector, f32 vs int8: same sources found at matching
    positions (the PTQ quality gate)."""
    from caesar_yolo_tpu.detect.predictor import Predictor
    from caesar_yolo_tpu.models.convert import load_params
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils.boxes import iou_matrix_np

    params, meta = load_params(FIXTURE)
    model = build_model(meta["model"], num_classes=int(meta["num_classes"]))
    pipe = build_preprocessor(normalize_minmax=True)

    img = rng.normal(0.0, 0.08, (96, 96)).astype(np.float32)
    yy, xx_ = np.mgrid[0:96, 0:96]
    for cx, cy in [(30, 30), (70, 62)]:
        img += 6.0 * np.exp(-((xx_ - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * 4.5 ** 2)).astype(np.float32)
    tile = img[..., None]
    prepped, ok = pipe(tile)
    assert bool(ok)
    inp = np.repeat(np.asarray(prepped), 3, axis=-1)

    pf = Predictor(model, params, img_size=96, score_thr=0.3,
                   compute_dtype=jnp.float32)
    bf, sf, cf = pf.predict_image(inp)

    calib = calibration_inputs_from_tiles(
        tile[None], preprocessor=pipe, img_size=96,
        compute_dtype=jnp.float32)
    qparams = quantize_model(model, params, calib)
    pq = Predictor(model, qparams, img_size=96, score_thr=0.3,
                   compute_dtype=jnp.float32, fuse=False)
    bq, sq, cq = pq.predict_image(inp)

    assert len(bf) == 2, "float baseline must find both sources"
    assert len(bq) == len(bf), f"int8 found {len(bq)} vs f32 {len(bf)}"
    iou = iou_matrix_np(np.asarray(bf, float), np.asarray(bq, float))
    assert (iou.max(axis=1) >= 0.85).all(), f"boxes moved: {iou}"
    np.testing.assert_array_equal(np.sort(cf), np.sort(cq))
    assert np.abs(np.sort(sf) - np.sort(sq)).max() < 0.1


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="trained fixture weights not built")
def test_cli_int8_detects_sources(tmp_path, monkeypatch, rng):
    """--int8 end to end: tiled detection on a synthetic mosaic finds
    the planted sources through the quantized engine."""
    from caesar_yolo_tpu.cli.run import main
    from caesar_yolo_tpu.utils.fits import write_fits

    img = rng.normal(0.0, 0.08, (192, 192)).astype(np.float32)
    yy, xx_ = np.mgrid[0:192, 0:192]
    for cx, cy in [(48, 48), (144, 144)]:
        img += 6.0 * np.exp(-((xx_ - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * 4.5 ** 2)).astype(np.float32)
    path = tmp_path / "m.fits"
    write_fits(img, str(path))
    monkeypatch.chdir(tmp_path)
    rc = main([f"--image={path}", f"--weights={FIXTURE}", "--int8",
               "--imgsize=96", "--scoreThr=0.3",
               "--preprocessing", "--normalize_minmax",
               "--split_img_in_tiles", "--tile_xsize=96", "--tile_ysize=96",
               "--tile_xstep=0.75", "--tile_ystep=0.75", "--batch_size=8"])
    assert rc == 0
    import json
    cat = json.loads((tmp_path / "catalog_m.json").read_text())
    assert len(cat["sources"]) >= 2
