"""Capstone integration test: a REAL (synthetically-trained) detector
through the full tiled pipeline recovers known sources.

Uses tests/fixtures/yolov8n_synth96.npz — yolov8n trained from scratch
on-TPU on synthetic Gaussian sources (scripts/train_synth_demo.py,
held-out completeness 0.99).  Unlike the random-weight tests, this
validates that tiling, batched inference, edge flagging, and cross-tile
stitching COMPOSE correctly: sources straddling tile boundaries must
come out once, at the right place.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.convert import load_params
from caesar_yolo_tpu.models.yolo import build_model
from caesar_yolo_tpu.ops import build_preprocessor
from caesar_yolo_tpu.parallel import SFinder, SFinderConfig, make_mesh
from caesar_yolo_tpu.utils.boxes import iou_matrix_np
from caesar_yolo_tpu.utils.synth import write_mosaic_fits

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov8n_synth96.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="trained fixture weights not built")


@pytest.fixture(scope="module")
def trained():
    params, meta = load_params(FIXTURE)
    model = build_model(meta["model"], num_classes=int(meta["num_classes"]))
    return model, params


def _completeness(gt_boxes, cat_sources, iou_thr=0.4):
    if not cat_sources:
        return 0.0
    pred = np.asarray([[s["x1"], s["y1"], s["x2"], s["y2"]]
                       for s in cat_sources], float)
    iou = iou_matrix_np(np.asarray(gt_boxes, float), pred)
    return float((iou.max(axis=1) >= iou_thr).mean())


def test_trained_tiled_pipeline_recovers_sources(tmp_path, trained,
                                                 monkeypatch):
    model, params = trained
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "mosaic.fits")
    # deterministic layout matched to the training distribution: one
    # source per tile interior plus one straddling a tile boundary (the
    # stitch case).  Source extent stays below the 24px tile overlap —
    # the same overlap-vs-source-size requirement the reference pipeline
    # has (tile_step must leave overlap > max source size).
    rng = np.random.default_rng(0)
    img = rng.normal(0.0, 0.08, (192, 192)).astype(np.float32)
    yy, xx = np.mgrid[0:192, 0:192]
    centers = [(48, 48), (144, 48), (48, 144), (144, 144),
               (96, 96)]  # last one sits on the 4-tile corner
    gt = []
    for cx, cy in centers:
        s = 4.5
        img += 6.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * s * s)).astype(np.float32)
        gt.append([cx - 2 * s, cy - 2 * s, cx + 2 * s, cy + 2 * s])
    from caesar_yolo_tpu.utils.fits import write_fits
    write_fits(img, path)
    gt = np.asarray(gt)
    cfg = SFinderConfig(
        image_path=path, image_xmin=-1, image_xmax=-1, image_ymin=-1,
        image_ymax=-1, img_size=96, score_thr=0.30,
        split_image_in_tiles=True, tile_xsize=96, tile_ysize=96,
        tile_xstep=0.75, tile_ystep=0.75, batch_size=8)
    preproc = build_preprocessor(normalize_minmax=True)
    sf = SFinder(model, params, cfg, preprocessor=preproc,
                 mesh=make_mesh(),
                 engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_mosaic.json").read_text())
    srcs = cat["sources"]
    comp = _completeness(gt, srcs)
    assert comp >= 0.8, f"completeness {comp} over {len(srcs)} detections"
    # overlapping tiles must not produce duplicate detections of one gt
    pred = np.asarray([[s["x1"], s["y1"], s["x2"], s["y2"]]
                       for s in srcs], float)
    iou = iou_matrix_np(np.asarray(gt, float), pred)
    dup = (iou >= 0.4).sum(axis=1)
    assert (dup <= 1).all(), f"duplicate stitched detections: {dup}"


def test_trained_serial_matches_tiled(tmp_path, trained, monkeypatch):
    """Serial whole-image detection finds the same sources the tiled path
    does (tiling must be transparent)."""
    model, params = trained
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "m2.fits")
    gt = write_mosaic_fits(path, nx=96, ny=96, n_sources=2, seed=3,
                           noise_sigma=0.08, amp_range=(3.0, 8.0),
                           sigma_range=(4.0, 7.0))
    preproc = build_preprocessor(normalize_minmax=True)
    cfg = SFinderConfig(image_path=path, image_xmin=-1, image_xmax=-1,
                        image_ymin=-1, image_ymax=-1, img_size=96,
                        score_thr=0.10)
    sf = SFinder(model, params, cfg, preprocessor=preproc,
                 engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run() == 0
    comp = _completeness(gt, sf.sources["sources"])
    assert comp >= 0.5


def test_evaluate_cli_with_trained_weights(tmp_path, monkeypatch):
    """The evaluation CLI produces meaningful C/R with the trained fixture
    (the reference's make_prediction macro flow)."""
    import jax
    from caesar_yolo_tpu.cli.evaluate import main
    from caesar_yolo_tpu.utils.fits import write_fits

    rng = np.random.default_rng(5)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    paths = []
    yy, xx = np.mgrid[0:96, 0:96]
    for i in range(4):
        img = rng.normal(0.0, 0.08, (96, 96)).astype(np.float32)
        cx, cy, s = rng.uniform(20, 76), rng.uniform(20, 76), 4.5
        img += 6.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * s * s)).astype(np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / (hi - lo)
        p = tmp_path / "images" / f"im{i}.fits"
        write_fits(img, str(p))
        # class 1 = compact; normalized cx cy w h
        (tmp_path / "labels" / f"im{i}.txt").write_text(
            f"1 {cx/96:.4f} {cy/96:.4f} {4*s/96:.4f} {4*s/96:.4f}\n")
        paths.append(str(p))
    (tmp_path / "filelist.txt").write_text("\n".join(paths))

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([f"--weights={FIXTURE}",
                   f"--filelist={tmp_path / 'filelist.txt'}",
                   f"--label_dir={tmp_path / 'labels'}",
                   "--imgsize=96", "--scoreThr=0.3",
                   "--iouThr_match=0.4"])
    assert rc == 0
    out = buf.getvalue()
    assert "compact" in out
    # all 4 single bright sources should be found
    import re
    m = re.search(r"compact: C=([0-9.]+)", out)
    assert m and float(m.group(1)) >= 0.75, out


def test_device_tiling_matches_host_path(tmp_path, trained, monkeypatch):
    """Device-resident tiling (mosaic shipped to HBM once, windows
    extracted in-graph) must produce the same catalog as the streaming
    windowed-read host path — on an OVERLAPPING grid with truncated edge
    tiles (two tile shapes), over the 8-device mesh."""
    model, params = trained
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "m3.fits")
    rng = np.random.default_rng(11)
    img = rng.normal(0.0, 0.08, (160, 160)).astype(np.float32)
    yy, xx = np.mgrid[0:160, 0:160]
    for cx, cy in [(48, 48), (120, 48), (80, 130), (84, 84)]:
        img += 6.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * 4.5 ** 2)).astype(np.float32)
    from caesar_yolo_tpu.utils.fits import write_fits
    write_fits(img, path)

    def run(devtile, out, **kw):
        cfg = SFinderConfig(
            image_path=path, image_xmin=-1, image_xmax=-1, image_ymin=-1,
            image_ymax=-1, img_size=96, score_thr=0.30,
            split_image_in_tiles=True, tile_xsize=96, tile_ysize=96,
            tile_xstep=0.75, tile_ystep=0.75, batch_size=8,
            device_tiling=devtile,
            outfile_json=str(tmp_path / out), save_region=False, **kw)
        sf = SFinder(model, params, cfg, preprocessor=build_preprocessor(
            normalize_minmax=True), mesh=make_mesh(),
            engine_kwargs={"compute_dtype": jnp.float32})
        assert sf.run_tiled() == 0
        return json.loads((tmp_path / out).read_text())["sources"]

    dev = run("on", "cat_dev.json")
    host = run("off", "cat_host.json")
    # mosaic (160*160*4 B) over the cap, one 96px band (160*96*4 B)
    # under it -> banded device tiling (one band per grid row)
    band = run("auto", "cat_band.json", device_tiling_max_bytes=80_000)
    assert len(dev) == len(host) == len(band) and len(dev) >= 4
    key = lambda s: (s["x1"], s["y1"])
    for variant in (dev, band):
        for d, h in zip(sorted(variant, key=key), sorted(host, key=key)):
            assert d["class_id"] == h["class_id"]
            np.testing.assert_allclose(
                [d[k] for k in ("x1", "y1", "x2", "y2", "score")],
                [h[k] for k in ("x1", "y1", "x2", "y2", "score")],
                rtol=0, atol=1e-3)


def test_engine_mosaic_slices_match_host_windows(trained):
    """process_mosaic_async on device-extracted windows == process() on
    host-sliced windows of the same mosaic (bit-level pixel parity of
    the in-graph dynamic_slice extraction)."""
    model, params = trained
    from caesar_yolo_tpu.parallel.engine import TileEngine
    rng = np.random.default_rng(13)
    mosaic = rng.normal(0.0, 0.08, (128, 128)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    mosaic[16:112, 16:112] += 6.0 * np.exp(
        -((xx - 48) ** 2 + (yy - 48) ** 2) / (2 * 4.5 ** 2))
    preproc = build_preprocessor(normalize_minmax=True)
    eng = TileEngine(model, params, preprocessor=preproc, img_size=96,
                     score_thr=0.30, compute_dtype=jnp.float32)
    origins = np.asarray([[0, 0], [32, 32], [0, 32]], np.int32)
    host = np.stack([mosaic[y:y + 96, x:x + 96] for y, x in origins])
    o_host = eng.process(host[..., None])
    o_dev = tuple(np.asarray(o) for o in eng.process_mosaic_async(
        eng.put_mosaic(mosaic), origins, (96, 96)))
    assert (o_host[3] == o_dev[3]).all()          # valid masks
    assert o_host[3].sum() >= 1
    np.testing.assert_allclose(o_dev[0][o_dev[3]], o_host[0][o_host[3]],
                               atol=1e-4)
    np.testing.assert_allclose(o_dev[1][o_dev[3]], o_host[1][o_host[3]],
                               atol=1e-5)


def test_relay_bf16_matches_f32(trained):
    """relay_dtype="bfloat16" (half host->device bytes) must find the
    same sources as the exact-f32 relay: bf16 keeps the full f32
    exponent range, so the ~0.4% mantissa rounding only perturbs boxes
    at sub-pixel level on real detections."""
    model, params = trained
    rng = np.random.default_rng(7)
    img = rng.normal(0.0, 0.08, (2, 96, 96, 1)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    for k, (cx, cy) in enumerate([(40, 40), (60, 30)]):
        img[k, :, :, 0] += 6.0 * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 4.5 ** 2))
    preproc = build_preprocessor(normalize_minmax=True)
    from caesar_yolo_tpu.parallel.engine import TileEngine
    e32 = TileEngine(model, params, preprocessor=preproc, img_size=96,
                     score_thr=0.30, compute_dtype=jnp.float32)
    e16 = TileEngine(model, params, preprocessor=preproc, img_size=96,
                     score_thr=0.30, compute_dtype=jnp.float32,
                     relay_dtype="bfloat16")
    o32 = e32.process(img)
    o16 = e16.process(img)
    v32, v16 = o32[3], o16[3]
    assert v32.sum() >= 2, "fixture must detect the injected sources"
    assert v32.sum() == v16.sum()
    np.testing.assert_allclose(o16[0][v16], o32[0][v32], atol=1.5)
    np.testing.assert_allclose(o16[1][v16], o32[1][v32], atol=0.03)
    assert (o16[2][v16] == o32[2][v32]).all()

def test_preproc_context_global_matches_host_oracle(tmp_path, trained,
                                                    monkeypatch):
    """preproc_context='global' is DEFINED as: preprocess the whole
    mosaic once, then detect on tiles sliced from the result.  Pin that
    definition against an explicit host oracle — preprocess the mosaic
    on host with the same pipeline, write it out, and run the tiled
    pipeline with NO preprocessor: catalogs must match exactly.  Also
    pin the intended tile-vs-global divergence: with a bright blob in
    one corner, per-tile minmax context (reference parity,
    evaluation.py:157-161 per window) and global context yield
    DIFFERENT catalogs on the same image (VERDICT r3 weak #6)."""
    model, params = trained
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.utils.fits import write_fits

    rng = np.random.default_rng(21)
    img = rng.normal(0.0, 0.08, (160, 160)).astype(np.float32)
    yy, xx = np.mgrid[0:160, 0:160]
    for cx, cy in [(48, 48), (120, 48), (80, 130)]:
        img += 6.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * 4.5 ** 2)).astype(np.float32)
    # a very bright compact blob: its tile's minmax differs wildly from
    # the whole-mosaic minmax, so the two contexts must diverge
    img += 80.0 * np.exp(-((xx - 140) ** 2 + (yy - 140) ** 2)
                         / (2 * 3.0 ** 2)).astype(np.float32)
    path = str(tmp_path / "ctx.fits")
    write_fits(img, path)

    preproc = build_preprocessor(normalize_minmax=True)

    def run(image_path, out, pp, **kw):
        cfg = SFinderConfig(
            image_path=image_path, image_xmin=-1, image_xmax=-1,
            image_ymin=-1, image_ymax=-1, img_size=96, score_thr=0.30,
            split_image_in_tiles=True, tile_xsize=96, tile_ysize=96,
            tile_xstep=0.75, tile_ystep=0.75, batch_size=8,
            device_tiling="on", outfile_json=str(tmp_path / out),
            save_region=False, **kw)
        sf = SFinder(model, params, cfg, preprocessor=pp,
                     mesh=make_mesh(),
                     engine_kwargs={"compute_dtype": jnp.float32})
        assert sf.run_tiled() == 0
        return json.loads((tmp_path / out).read_text())["sources"]

    glob = run(path, "cat_global.json", preproc,
               preproc_context="global")

    # host oracle: whole-image preprocessing, then a pipeline-free run
    out_img, ok = preproc.apply_batch(
        jnp.asarray(img)[None, :, :, None])
    assert bool(np.asarray(ok)[0])
    opath = str(tmp_path / "ctx_prepped.fits")
    write_fits(np.asarray(out_img)[0, :, :, 0], opath)
    oracle = run(opath, "cat_oracle.json", None)

    assert len(glob) == len(oracle) >= 3
    key = lambda s: (s["x1"], s["y1"])
    for g, o in zip(sorted(glob, key=key), sorted(oracle, key=key)):
        assert g["class_id"] == o["class_id"]
        np.testing.assert_allclose(
            [g[k] for k in ("x1", "y1", "x2", "y2", "score")],
            [o[k] for k in ("x1", "y1", "x2", "y2", "score")],
            rtol=0, atol=1e-3)

    # reference-parity tile context on the SAME image: different catalog
    # (per-tile minmax rescales the faint sources' tiles to full range;
    # globally the bright blob compresses them) — intended semantics,
    # both contexts are correct, the context is a user choice
    tile_ctx = run(path, "cat_tile.json", preproc,
                   preproc_context="tile")
    tset = {(round(s["x1"], 2), round(s["y1"], 2), round(s["score"], 4))
            for s in tile_ctx}
    gset = {(round(s["x1"], 2), round(s["y1"], 2), round(s["score"], 4))
            for s in glob}
    assert tset != gset
