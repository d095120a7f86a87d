"""Serving export (deploy.py): serialize/deserialize roundtrip parity
with the live TileEngine, weights embedded, no model code needed."""

import numpy as np
import jax.numpy as jnp

from caesar_yolo_tpu.deploy import (build_serving_step, export_detector,
                                    load_detector)
from caesar_yolo_tpu.models.yolo import build_model, init_params
from caesar_yolo_tpu.ops import build_preprocessor
from caesar_yolo_tpu.parallel.engine import TileEngine


def _tiles(rng, b=2, h=64, w=64):
    t = rng.random((b, h, w, 1), dtype=np.float32)
    if b > 1:
        t[1, :8, :8] = 0.0  # masked corner, still valid
    return t


def test_export_roundtrip_matches_engine(rng):
    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, 0)
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    tiles = _tiles(rng)

    engine = TileEngine(model, params, preprocessor=pipe, img_size=64,
                        score_thr=0.01, max_det=20)
    ref = engine.process(tiles)

    blob = export_detector(model, params, preprocessor=pipe,
                           tile_shape=tiles.shape[1:], batch=tiles.shape[0],
                           img_size=64, score_thr=0.01, max_det=20)
    assert isinstance(blob, bytes) and len(blob) > 0
    det = load_detector(blob)
    got = tuple(np.asarray(o) for o in det(jnp.asarray(tiles)))

    assert len(ref) == len(got) == 6
    for name, r, g in zip(("boxes", "scores", "cls", "valid", "tile_ok",
                           "ndrop"), ref, got):
        np.testing.assert_allclose(r, g, atol=1e-5, err_msg=name)


def test_serving_step_degenerate_tile(rng):
    """All-zero tiles must flag tile_ok=False through the exported step
    semantics (same guard as the engine)."""
    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, 0)
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    step = build_serving_step(model, params, preprocessor=pipe,
                              img_size=64, score_thr=0.01)
    tiles = _tiles(rng)
    tiles[0] = 0.0
    out = step(jnp.asarray(tiles))
    tile_ok = np.asarray(out[4])
    assert tile_ok.tolist() == [False, True]
    assert not np.asarray(out[3])[0].any()  # no valid dets on dead tile


def test_export_blob_is_standalone(rng, tmp_path):
    """The artifact reloads from disk bytes alone (file -> call),
    the deployment contract."""
    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, 0)
    tiles = _tiles(rng, b=1, h=32, w=32)
    blob = export_detector(model, params, tile_shape=(32, 32, 1), batch=1,
                           img_size=32, score_thr=0.01, max_det=5)
    p = tmp_path / "det.cyx"
    p.write_bytes(blob)
    det = load_detector(p.read_bytes())
    out = det(jnp.asarray(tiles))
    assert out[0].shape == (1, 5, 4)


def test_export_cli(rng, tmp_path, monkeypatch):
    from caesar_yolo_tpu.cli.export import main
    from caesar_yolo_tpu.deploy import load_detector
    from caesar_yolo_tpu.models.convert import save_params

    m = build_model("yolov8n", num_classes=5)
    w = tmp_path / "w.npz"
    save_params(init_params(m, 0), str(w),
                meta={"model": "yolov8n", "num_classes": 5})
    out = tmp_path / "det.cyx"
    rc = main([f"--weights={w}", f"--out={out}", "--batch=1",
               "--tile_xsize=32", "--tile_ysize=32", "--imgsize=32",
               "--scoreThr=0.01", "--max_det=5",
               "--preprocessing", "--zscale_stretch", "--normalize_minmax"])
    assert rc == 0 and out.exists()
    det = load_detector(out.read_bytes())
    res = det(jnp.asarray(_tiles(rng, b=1, h=32, w=32)))
    assert res[0].shape == (1, 5, 4)


def test_export_quantized_detector(rng):
    """int8 PTQ params export/serve through the same artifact path."""
    from caesar_yolo_tpu.models.quant import (calibration_inputs_from_tiles,
                                              quantize_model)

    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, 0)
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    tiles = _tiles(rng, b=1, h=32, w=32)
    calib = calibration_inputs_from_tiles(tiles, preprocessor=pipe,
                                          img_size=32)
    qparams = quantize_model(model, params, calib)
    blob = export_detector(model, qparams, preprocessor=pipe,
                           tile_shape=(32, 32, 1), batch=1, img_size=32,
                           score_thr=0.01, max_det=5, fuse=False)
    det = load_detector(blob)
    out = det(jnp.asarray(tiles))
    assert out[0].shape == (1, 5, 4)
    assert np.isfinite(np.asarray(out[0], np.float32)).all()


def test_http_serving_daemon(rng, tmp_path):
    """cli.serve: export -> serve over HTTP -> detections match the live
    engine (raw-bytes and .npy request formats, health + error paths)."""
    import io
    import json as _json
    import threading
    import urllib.request

    from caesar_yolo_tpu.cli.serve import build_server
    from caesar_yolo_tpu.ops import build_preprocessor

    model = build_model("yolov8n", num_classes=5)
    params = init_params(model, 0)
    pipe = build_preprocessor(zscale_stretch=True, normalize_minmax=True)
    tiles = _tiles(rng, b=2, h=48, w=48)
    blob = export_detector(model, params, preprocessor=pipe,
                           tile_shape=(48, 48, 1), batch=2, img_size=64,
                           score_thr=0.01, max_det=10)
    art = tmp_path / "det.cyx"
    art.write_bytes(blob)

    server = build_server(str(art), "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = _json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["input_shape"] == [2, 48, 48, 1]

        # raw f32 request
        req = urllib.request.Request(f"{base}/detect",
                                     data=tiles.astype("<f4").tobytes())
        resp = _json.load(urllib.request.urlopen(req))
        assert len(resp["detections"]) == 2
        assert resp["tile_ok"] == [True, True]

        # .npy request gives the same answer
        buf = io.BytesIO()
        np.save(buf, tiles)
        req2 = urllib.request.Request(f"{base}/detect", data=buf.getvalue())
        resp2 = _json.load(urllib.request.urlopen(req2))
        assert resp2 == resp

        # parity vs the in-process artifact call
        det = load_detector(blob)
        ref = det(jnp.asarray(tiles))
        v0 = np.asarray(ref[3][0])
        got_boxes = np.asarray(resp["detections"][0]["boxes"],
                               np.float32).reshape(-1, 4)
        np.testing.assert_allclose(got_boxes, np.asarray(ref[0][0])[v0],
                                   atol=1e-4)

        # wrong payload size -> 400
        bad = urllib.request.Request(f"{base}/detect", data=b"123")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_verify_pt_parity_kit(tmp_path):
    """The real-weights parity kit (scripts/verify_pt_parity.py) passes
    end to end on a calibrated random-weight twin checkpoint — the day a
    released ultralytics .pt exists, the BASELINE IoU>=0.99 claim is the
    same single invocation."""
    import importlib.util
    import os
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import ultra_ref as U
    from caesar_yolo_tpu.utils.synth import write_mosaic_fits

    fits = tmp_path / "field.fits"
    write_mosaic_fits(str(fits), nx=192, ny=192, n_sources=12, seed=4)

    # calibrated twin (BN stats + head conditioning persist through the
    # state dict) saved as a plain-.pt checkpoint
    from caesar_yolo_tpu.ops import build_preprocessor
    from caesar_yolo_tpu.utils.fits import read_fits
    data = np.asarray(read_fits(str(fits))[0], np.float32)
    img = np.repeat(data[:, :, None], 3, axis=-1)
    img = np.asarray(build_preprocessor(zscale_stretch=True,
                                        normalize_minmax=True)(img)[0],
                     np.float32)
    lb, _, _, _ = U.ultra_letterbox(img, 192)
    t = torch.from_numpy(np.ascontiguousarray(
        lb[:, :, ::-1].transpose(2, 0, 1)))[None] / 255.0
    tm = U.build_torch_twin("yolov8n", seed=11, calib=t)
    pt = tmp_path / "yolov8n.pt"
    sd = dict(tm.state_dict())
    # real ultralytics checkpoints carry the frozen DFL expectation
    # filter the twins compute implicitly — the kit must IGNORE it,
    # not exit with "checkpoint/graph key mismatch"
    sd["model.22.dfl.conv.weight"] = torch.arange(
        16, dtype=torch.float32).view(1, 16, 1, 1)
    torch.save(sd, str(pt))

    spec = importlib.util.spec_from_file_location(
        "verify_pt_parity",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "verify_pt_parity.py"))
    kit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kit)

    verdict = kit.verify(str(pt), str(fits), img_size=192)
    assert verdict["verdict"] == "PASS", verdict
    assert verdict["n_torch"] == verdict["n_jax"] >= 1
    assert all(p["iou"] >= 0.99 for p in verdict["pairs"])


def test_export_portable_with_native_batch_stages(rng):
    """Exporting a detector whose preprocessor has native Pallas batch
    stages (chan3 -> hist-eq) and whose graph has the C2PSA attention
    (yolo11 @128px, n=16) must trace the platform-neutral XLA
    formulations — Mosaic kernels would not lower for other platforms —
    and the artifact must still match the live engine."""
    model = build_model("yolo11n", num_classes=2)
    params = init_params(model, 0)
    pipe = build_preprocessor(chan3_preproc=True, normalize_minmax=True)
    assert any(getattr(s, "batch", None) is not None for s in pipe.stages)
    tiles = _tiles(rng, b=2, h=128, w=128)

    engine = TileEngine(model, params, preprocessor=pipe, img_size=128,
                        score_thr=0.01, max_det=20)
    ref = engine.process(tiles)

    blob = export_detector(model, params, preprocessor=pipe,
                           tile_shape=tiles.shape[1:], batch=tiles.shape[0],
                           img_size=128, score_thr=0.01, max_det=20)
    det = load_detector(blob)
    got = tuple(np.asarray(o) for o in det(jnp.asarray(tiles)))
    for name, r, g in zip(("boxes", "scores", "cls", "valid", "tile_ok",
                           "ndrop"), ref, got):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(g, np.float32),
                                   atol=2e-4, err_msg=name)
