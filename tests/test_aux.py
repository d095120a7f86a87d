"""Auxiliary-subsystem tests: crash-resume spooling, augmentation,
dataset loading, CLI validation."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caesar_yolo_tpu.models.yolo import build_model, init_params
from caesar_yolo_tpu.parallel import SFinder, SFinderConfig
from caesar_yolo_tpu.train.augment import augment_batch
from caesar_yolo_tpu.train.dataset import DetectionDataset, parse_dataset_yaml
from caesar_yolo_tpu.utils.fits import write_fits


@pytest.fixture(scope="module")
def tiny_model():
    m = build_model("yolov8n", num_classes=5)
    return m, init_params(m, seed=0)


def test_spool_resume_skips_done_tiles(tmp_path, tiny_model,
                                       galaxy_fits_path, monkeypatch):
    """A tile result already in the spool is not recomputed and appears in
    the final catalog."""
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    fake_obj = {"name": "S1_t0", "x1": 1.0, "x2": 5.0, "y1": 1.0,
                "y2": 5.0, "class_id": 1, "class_name": "compact",
                "score": 0.99, "edge": 0}
    cfg = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=0.9999,
        split_image_in_tiles=True, tile_xsize=66, tile_ysize=66,
        batch_size=4, resume=True)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    spool = tmp_path / ".galaxy0001.tilespool.jsonl"
    spool.write_text(
        json.dumps({"gridSig": sf._grid_signature()}) + "\n"
        + json.dumps(
            {"objs": [fake_obj], "tileId": 0, "workerId": 0,
             "neighborTileIds": [], "xmin": 0, "xmax": 66, "ymin": 0,
             "ymax": 66}) + "\n")
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_galaxy0001.json").read_text())
    names = {s["score"] for s in cat["sources"]}
    assert 0.99 in names  # spooled tile survived into the catalog
    assert not spool.exists()  # cleaned up after a successful run


def test_spool_resume_with_device_tiling(tmp_path, tiny_model,
                                         galaxy_fits_path, monkeypatch):
    """Resume composes with device-resident tiling: the spooled tile is
    not recomputed (forced device_tiling='on') and survives into the
    catalog."""
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    fake_obj = {"name": "S1_t0", "x1": 1.0, "x2": 5.0, "y1": 1.0,
                "y2": 5.0, "class_id": 1, "class_name": "compact",
                "score": 0.98, "edge": 0}
    cfg = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=0.9999,
        split_image_in_tiles=True, tile_xsize=66, tile_ysize=66,
        batch_size=4, resume=True, device_tiling="on")
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    spool = tmp_path / ".galaxy0001.tilespool.jsonl"
    spool.write_text(
        json.dumps({"gridSig": sf._grid_signature()}) + "\n"
        + json.dumps(
            {"objs": [fake_obj], "tileId": 0, "workerId": 0,
             "neighborTileIds": [], "xmin": 0, "xmax": 66, "ymin": 0,
             "ymax": 66}) + "\n")
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_galaxy0001.json").read_text())
    assert 0.98 in {s["score"] for s in cat["sources"]}
    assert sf.report.n_local_tiles == sf.report.n_tiles - 1
    assert not spool.exists()


def test_spool_rejected_on_config_change(tmp_path, tiny_model,
                                         galaxy_fits_path, monkeypatch):
    """A spool written under a DIFFERENT tiling must be ignored (stale
    tids/windows from another grid would corrupt the stitched catalog),
    and legacy spools without a signature are rejected the same way."""
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    fake_obj = {"name": "S1_t0", "x1": 1.0, "x2": 5.0, "y1": 1.0,
                "y2": 5.0, "class_id": 1, "class_name": "compact",
                "score": 0.97, "edge": 0}
    cfg_old = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=0.9999,
        split_image_in_tiles=True, tile_xsize=33, tile_ysize=33,
        batch_size=4, resume=True)
    cfg_new = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=0.9999,
        split_image_in_tiles=True, tile_xsize=66, tile_ysize=66,
        batch_size=4, resume=True)
    sf_old = SFinder(m, p, cfg_old)
    record = json.dumps(
        {"objs": [fake_obj], "tileId": 9, "workerId": 0,
         "neighborTileIds": [], "xmin": 0, "xmax": 33, "ymin": 0,
         "ymax": 33}) + "\n"
    spool = tmp_path / ".galaxy0001.tilespool.jsonl"
    for content in (
            json.dumps({"gridSig": sf_old._grid_signature()}) + "\n"
            + record,          # different grid
            record):           # legacy spool, no signature
        spool.write_text(content)
        sf = SFinder(m, p, cfg_new,
                     engine_kwargs={"compute_dtype": jnp.float32})
        assert sf.run_tiled() == 0
        cat = json.loads(
            (tmp_path / "catalog_galaxy0001.json").read_text())
        assert 0.97 not in {s["score"] for s in cat["sources"]}


def test_spool_guard_max_tasks(tmp_path, tiny_model, galaxy_fits_path,
                               monkeypatch):
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    cfg = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, split_image_in_tiles=True,
        tile_xsize=33, tile_ysize=33, max_ntasks_per_worker=3)
    sf = SFinder(m, p, cfg)
    assert sf.run_tiled() == -1  # 16 tiles on 1 device > 3 allowed


def test_augment_flip_only():
    """degrees~0, scale~0 with certain flips: boxes mirror exactly."""
    key = jax.random.PRNGKey(0)
    img = np.zeros((1, 32, 32, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    boxes = np.asarray([[[4.0, 6.0, 10.0, 12.0]]], np.float32)
    mask = np.ones((1, 1), bool)
    out, oboxes, omask = augment_batch(key, img, boxes, mask,
                                       degrees=0.0, scale=0.0,
                                       flipud=1.0, fliplr=1.0)
    assert omask.all()
    np.testing.assert_allclose(
        np.asarray(oboxes[0, 0]), [32 - 10, 32 - 12, 32 - 4, 32 - 6],
        atol=1e-4)
    out = np.asarray(out)
    assert out[0, 32 - 1 - 2, 32 - 1 - 3, 0] == pytest.approx(1.0, abs=1e-5)


def test_augment_rotation_preserves_center_box():
    """A centered square under pure rotation keeps its center; the mask
    filter drops boxes that degenerate."""
    key = jax.random.PRNGKey(1)
    img = np.random.default_rng(0).random((2, 64, 64, 1), dtype=np.float32)
    boxes = np.asarray([[[24, 24, 40, 40]], [[28, 28, 36, 36]]], np.float32)
    mask = np.ones((2, 1), bool)
    _, oboxes, omask = augment_batch(key, img, boxes, mask,
                                     degrees=180.0, scale=0.0,
                                     flipud=0.0, fliplr=0.0)
    ob = np.asarray(oboxes)
    centers = np.stack([(ob[..., 0] + ob[..., 2]) / 2,
                        (ob[..., 1] + ob[..., 3]) / 2], -1)
    # boxes are edge coordinates: the rotation center is w/2 = 32.0
    # (the image resampler's (w-1)/2 is pixel-INDEX space)
    np.testing.assert_allclose(centers, 32.0, atol=0.15)
    assert np.asarray(omask).all()


def _make_dataset(root, n=6, size=48):
    rng = np.random.default_rng(0)
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    for i in range(n):
        img = rng.random((size, size), np.float32)
        write_fits(img, str(root / "images" / f"im{i}.fits"))
        (root / "labels" / f"im{i}.txt").write_text(
            "1 0.5 0.5 0.25 0.25\n2 0.2 0.2 0.1 0.1\n")


def test_dataset_loader(tmp_path):
    _make_dataset(tmp_path)
    ds = DetectionDataset(str(tmp_path / "images"), img_size=64,
                          batch_size=2, max_gt=8)
    assert len(ds) == 3
    batches = list(ds)
    assert len(batches) == 3
    imgs, labels, boxes, masks = batches[0]
    assert imgs.shape == (2, 64, 64, 3)
    assert boxes.shape == (2, 8, 4)
    assert masks[:, :2].all() and not masks[:, 2:].any()
    # boxes landed inside the letterboxed frame, denormalized
    assert (boxes[masks] >= 0).all() and (boxes[masks] <= 64).all()
    assert labels[0, 0] == 1 and labels[0, 1] == 2


def test_dataset_yaml(tmp_path):
    _make_dataset(tmp_path / "data")
    (tmp_path / "ds.yaml").write_text(
        "path: %s\ntrain: data/images\nval: data/images\n"
        "names:\n  0: spurious\n  1: compact\n" % tmp_path)
    spec = parse_dataset_yaml(str(tmp_path / "ds.yaml"))
    assert spec["names"] == ["spurious", "compact"]
    ds = DetectionDataset(str(tmp_path / "ds.yaml"), img_size=64,
                          batch_size=2, max_gt=4)
    assert ds.class_names == ["spurious", "compact"]
    assert len(ds.paths) == 6


def test_dataset_yaml_names_spellings(tmp_path):
    """ultralytics accepts three names: spellings — list block, inline
    flow list, and idx mapping; all must parse identically."""
    (tmp_path / "list.yaml").write_text(
        "path: /d\ntrain: images\nnames:\n  - spurious\n  - compact\n"
        "val: images\n")
    spec = parse_dataset_yaml(str(tmp_path / "list.yaml"))
    assert spec["names"] == ["spurious", "compact"]
    assert spec["val"] == "images"  # list block must not eat later keys
    (tmp_path / "flow.yaml").write_text(
        "train: images\nnames: ['spurious', compact, extended]\n")
    spec = parse_dataset_yaml(str(tmp_path / "flow.yaml"))
    assert spec["names"] == ["spurious", "compact", "extended"]


def test_cli_validation(tmp_path):
    from caesar_yolo_tpu.cli.run import parse_args, validate_args
    args = parse_args(["--weights=/nonexistent.npz", "--image=/nope.fits"])
    assert validate_args(args) == -1
    img = tmp_path / "a.fits"
    write_fits(np.zeros((8, 8), np.float32), str(img))
    w = tmp_path / "w.npz"
    w.write_bytes(b"")
    args = parse_args([f"--weights={w}", f"--image={img}"])
    assert validate_args(args) == 0
    args = parse_args([f"--weights={w}", f"--image={img}", "--maxnimgs=0"])
    assert validate_args(args) == -1


def test_cli_single_dash_aliases():
    """The reference declares eleven preprocessing flags as
    ('-name', '--name') pairs (reference scripts/run.py:80-107); migrated
    invocations using the single-dash spelling must parse unchanged."""
    from caesar_yolo_tpu.cli.run import parse_args
    args = parse_args([
        "--weights=w.npz", "--image=i.fits", "--preprocessing",
        "-sigma_clip_low=2.5", "-sigma_clip_up=3.5", "-sigma_bkg=4.0",
        "-norm_min=0.1", "-norm_max=0.9", "-nchannels=3",
        "-bkg_box_mask_fract=0.5", "-bkg_chid=1", "-clip_chid=2",
        "-sigma_clip=1.5", "-sigma_clip_baseline=0.5"])
    assert args.sigma_clip_low == 2.5 and args.sigma_clip_up == 3.5
    assert args.sigma_bkg == 4.0 and args.nchannels == 3
    assert (args.norm_min, args.norm_max) == (0.1, 0.9)
    assert args.bkg_box_mask_fract == 0.5
    assert (args.bkg_chid, args.clip_chid) == (1, 2)
    assert args.sigma_clip == 1.5 and args.sigma_clip_baseline == 0.5


def test_train_cli_smoke(tmp_path, monkeypatch):
    """One tiny epoch through the full training CLI: dataset -> augment ->
    sharded trainer -> checkpoint."""
    _make_dataset(tmp_path, n=4, size=48)
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.cli.train import main
    rc = main([f"--data={tmp_path / 'images'}", "--model=yolov8n",
               "--epochs=1", "--batch=2", "--imgsz=64", "--max_gt=8",
               "--checkpoint_dir=ckpt", "--no_augment"])
    assert rc == 0
    assert (tmp_path / "ckpt" / "last").exists()


def test_train_cli_augmented_device_batches(tmp_path, monkeypatch):
    """The AUGMENTED CLI path with --checkpoint_every=0: pins two real
    bugs the on-chip resume drill found — (a) the augmented batch was
    round-tripped device->host->device every step (~157 MB/step at
    640px; single-process runs must feed train_step DEVICE arrays), and
    (b) --checkpoint_every=0 crashed with ZeroDivisionError at the
    first epoch boundary."""
    import jax

    # >= one full batch AFTER the CLI pads batch_size up to the 8-device
    # test mesh (4 images would yield ZERO batches and a vacuous pass)
    _make_dataset(tmp_path, n=10, size=48)
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.train import trainer as trainer_mod
    seen_types = []
    orig = trainer_mod.Trainer.train_step

    def spy(self, images, *a, **k):
        seen_types.append(isinstance(images, jax.Array)
                          and not isinstance(images, np.ndarray))
        return orig(self, images, *a, **k)

    monkeypatch.setattr(trainer_mod.Trainer, "train_step", spy)
    from caesar_yolo_tpu.cli.train import main
    rc = main([f"--data={tmp_path / 'images'}", "--model=yolov8n",
               "--epochs=1", "--batch=2", "--imgsz=64", "--max_gt=8",
               "--checkpoint_dir=ckpt2", "--checkpoint_every=0"])
    assert rc == 0
    assert (tmp_path / "ckpt2" / "last").exists()
    assert seen_types and all(seen_types), \
        "augmented batches must stay on device in single-process runs"


def test_sfinder_serial_png(tmp_path, monkeypatch, tiny_model):
    """Serial detection on a PNG input (reference inference.py:511-519)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    m, p = tiny_model
    rng = np.random.default_rng(0)
    png = tmp_path / "img.png"
    plt.imsave(str(png), rng.random((64, 64)), cmap="gray")
    monkeypatch.chdir(tmp_path)
    cfg = SFinderConfig(image_path=str(png), image_xmin=-1, image_xmax=-1,
                        image_ymin=-1, image_ymax=-1, img_size=64,
                        score_thr=1e-4)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run() == 0
    assert (tmp_path / "out_img.json").exists()


def test_yolo11_predictor_end_to_end():
    from caesar_yolo_tpu.detect import Predictor
    m = build_model("yolo11n", num_classes=5)
    p = init_params(m, seed=0)
    pred = Predictor(m, p, img_size=64, score_thr=1e-4,
                     compute_dtype=jnp.float32)
    boxes, scores, cls = pred.predict_image(
        np.random.default_rng(1).random((48, 48, 3), dtype=np.float32))
    if len(boxes):
        assert (boxes[:, 2] <= 48).all() and (boxes[:, 3] <= 48).all()


def test_synthetic_mosaic_tiled_recovers_gt_regions(tmp_path, tiny_model,
                                                    monkeypatch):
    """System test: synthesize a mosaic with known sources, run the full
    tiled pipeline; the catalog exists and every reported source is inside
    the mosaic bounds."""
    from caesar_yolo_tpu.utils.synth import write_mosaic_fits
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "mosaic.fits")
    gt = write_mosaic_fits(path, nx=256, ny=256, n_sources=6, seed=1)
    assert gt.shape == (6, 4)
    cfg = SFinderConfig(image_path=path, image_xmin=-1, image_xmax=-1,
                        image_ymin=-1, image_ymax=-1, img_size=64,
                        score_thr=1e-4, split_image_in_tiles=True,
                        tile_xsize=128, tile_ysize=128, tile_xstep=1.0,
                        tile_ystep=1.0, batch_size=4)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run_tiled() == 0
    assert sf.report.n_tiles == 4
    cat = json.loads((tmp_path / "catalog_mosaic.json").read_text())
    for s in cat["sources"]:
        assert 0 <= s["x1"] <= 256 and 0 <= s["y2"] <= 256


def test_misc_utils(tmp_path):
    from caesar_yolo_tpu.utils.misc import (apply_mask, compose_fcns,
                                            read_filelist, read_table,
                                            set_type, to_uint8)
    f = tmp_path / "list.txt"
    f.write_text("a.fits\n\nb.fits\n")
    assert read_filelist(str(f)) == ["a.fits", "b.fits"]
    t = tmp_path / "t.dat"
    t.write_text("# hdr\n1 2 3\n4 5 6\n")
    np.testing.assert_array_equal(read_table(str(t)), [[1, 2, 3], [4, 5, 6]])
    img = np.zeros((4, 4, 3), np.float32)
    mask = np.zeros((4, 4)); mask[1, 1] = 1
    out = apply_mask(img, mask, (1.0, 0, 0), alpha=0.5)
    assert out[1, 1, 0] == 127.5 and out[0, 0, 0] == 0
    x = np.asarray([[0.0, 1.0], [3.0, np.nan]], np.float32)
    u = to_uint8(x)
    assert u.dtype == np.uint8 and u[0, 1] == 0 and u[1, 0] == 255
    f2 = compose_fcns(lambda v: v + 1, lambda v: v * 2)
    assert f2(3) == 7  # f(g(x)) = (3*2)+1
    assert set_type("float64") == "float32" and set_type("uint8") == "uint8"


def test_bn_train_mode_and_calibration():
    """Train-mode BN uses batch stats; calibrate_bn writes running stats
    that reproduce the train-mode output on the calibration data."""
    from caesar_yolo_tpu.models import layers
    from caesar_yolo_tpu.train import TrainConfig, Trainer
    rng = np.random.default_rng(0)
    m = build_model("yolov8n", num_classes=5)
    p = init_params(m, seed=0)
    x = jnp.asarray(rng.normal(0.5, 0.2, (2, 64, 64, 3)).astype(np.float32))
    raw_eval = m(p, x)
    with layers.train_mode():
        raw_train = m(p, x)
    # init running stats (0 mean/1 var) differ from batch stats
    assert not np.allclose(np.asarray(raw_eval[0][1]),
                           np.asarray(raw_train[0][1]), atol=1e-3)

    cfg = TrainConfig(epochs=1, batch_size=2, img_size=64)
    tr = Trainer(m, p, cfg, steps_per_epoch=1)
    tr.calibrate_bn([x])
    # calibrated eval mode ~ train-mode forward on the same single batch
    raw_cal = m(tr.state.params, x)
    np.testing.assert_allclose(np.asarray(raw_cal[0][1]),
                               np.asarray(raw_train[0][1]),
                               rtol=2e-2, atol=2e-3)


def test_cli_datalist_batched(tmp_path, monkeypatch):
    """Datalist detection runs through the batched compile-once path and
    writes per-image catalogs (reference scripts/run.py datalist loop)."""
    from caesar_yolo_tpu.cli.run import main
    from caesar_yolo_tpu.models.convert import save_params
    from caesar_yolo_tpu.models.yolo import build_model, init_params

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"cut{i}.fits"
        write_fits(rng.random((48, 48), np.float32), str(p))
        paths.append(str(p))
    (tmp_path / "list.txt").write_text("\n".join(paths))
    m = build_model("yolov8n", num_classes=5)
    w = tmp_path / "w.npz"
    save_params(init_params(m, 0), str(w),
                meta={"model": "yolov8n", "num_classes": 5})
    monkeypatch.chdir(tmp_path)
    rc = main([f"--weights={w}", f"--datalist={tmp_path / 'list.txt'}",
               "--imgsize=64", "--scoreThr=0.001", "--batch_size=2"])
    assert rc == 0
    import json as _json
    for i in range(3):
        cat = _json.loads((tmp_path / f"out_cut{i}.json").read_text())
        assert cat["image_id"] == f"cut{i}"
        assert (tmp_path / f"out_cut{i}.reg").exists()


def test_train_cli_with_validation(tmp_path, monkeypatch):
    """Training with a val split: per-epoch val F1 logged, 'best'
    checkpoint gated on it (reference gets this from ultralytics,
    macros/run_train.py:20-45)."""
    _make_dataset(tmp_path, n=4, size=48)
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.cli.train import main
    rc = main([f"--data={tmp_path / 'images'}", "--model=yolov8n",
               "--epochs=2", "--batch=2", "--imgsz=64", "--max_gt=8",
               "--checkpoint_dir=ckpt", "--no_augment",
               f"--val_data={tmp_path / 'images'}", "--val_every=1",
               "--val_score_thr=0.5"])
    assert rc == 0
    assert (tmp_path / "ckpt" / "best").exists()
    assert (tmp_path / "ckpt" / "last").exists()


def test_train_cli_fitness_gate(tmp_path, monkeypatch):
    """--gate_metric=fitness gates 'best' on 0.1*mAP50 + 0.9*mAP50-95
    (the criterion ultralytics' trainer uses for best.pt)."""
    _make_dataset(tmp_path, n=4, size=48)
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.cli.train import main
    rc = main([f"--data={tmp_path / 'images'}", "--model=yolov8n",
               "--epochs=1", "--batch=2", "--imgsz=64", "--max_gt=8",
               "--checkpoint_dir=ckpt", "--no_augment",
               f"--val_data={tmp_path / 'images'}", "--val_every=1",
               "--val_score_thr=0.5", "--gate_metric=fitness"])
    assert rc == 0
    assert (tmp_path / "ckpt" / "best").exists()


def test_cli_datalist_draw_falls_back_to_analyzer(tmp_path, monkeypatch):
    """--datalist with plot flags must keep the per-image Analyzer
    behavior (plots written) instead of the batched catalog-only path."""
    import matplotlib
    matplotlib.use("Agg")
    from caesar_yolo_tpu.cli.run import main
    from caesar_yolo_tpu.models.convert import save_params
    from caesar_yolo_tpu.models.yolo import build_model, init_params

    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"cut{i}.fits"
        write_fits(rng.random((48, 48), np.float32), str(p))
        paths.append(str(p))
    (tmp_path / "list.txt").write_text("\n".join(paths))
    m = build_model("yolov8n", num_classes=5)
    w = tmp_path / "w.npz"
    save_params(init_params(m, 0), str(w),
                meta={"model": "yolov8n", "num_classes": 5})
    monkeypatch.chdir(tmp_path)
    rc = main([f"--weights={w}", f"--datalist={tmp_path / 'list.txt'}",
               "--imgsize=64", "--scoreThr=0.001", "--draw_plots",
               "--save_plots"])
    assert rc == 0
    for i in range(2):
        assert (tmp_path / f"out_cut{i}.json").exists()
        assert (tmp_path / f"out_cut{i}.png").exists()


def test_cli_datalist_batched_degenerate_image(tmp_path, monkeypatch):
    """A degenerate (all-constant) image in a batched datalist run:
    no catalog written for it, nonzero exit — matching the per-image
    Analyzer path and the reference's failed-image behavior."""
    from caesar_yolo_tpu.cli.run import main
    from caesar_yolo_tpu.models.convert import save_params
    from caesar_yolo_tpu.models.yolo import build_model, init_params

    rng = np.random.default_rng(0)
    good = tmp_path / "good.fits"
    write_fits(rng.random((48, 48), np.float32), str(good))
    bad = tmp_path / "bad.fits"
    write_fits(np.zeros((48, 48), np.float32), str(bad))
    (tmp_path / "list.txt").write_text(f"{good}\n{bad}\n")
    m = build_model("yolov8n", num_classes=5)
    w = tmp_path / "w.npz"
    save_params(init_params(m, 0), str(w),
                meta={"model": "yolov8n", "num_classes": 5})
    monkeypatch.chdir(tmp_path)
    rc = main([f"--weights={w}", f"--datalist={tmp_path / 'list.txt'}",
               "--imgsize=64", "--scoreThr=0.001", "--batch_size=2",
               "--preprocessing", "--normalize_minmax"])
    assert rc == 1
    assert (tmp_path / "out_good.json").exists()
    assert not (tmp_path / "out_bad.json").exists()


def test_train_cli_smoke_with_augment(tmp_path, monkeypatch):
    """One tiny epoch WITH augmentation enabled: exercises the fast
    rot90+shear/scale resampler inside the real training loop."""
    _make_dataset(tmp_path, n=4, size=48)
    monkeypatch.chdir(tmp_path)
    from caesar_yolo_tpu.cli.train import main
    rc = main([f"--data={tmp_path / 'images'}", "--model=yolov8n",
               "--epochs=1", "--batch=2", "--imgsz=64", "--max_gt=8",
               "--checkpoint_dir=ckpt"])
    assert rc == 0
    assert (tmp_path / "ckpt" / "last").exists()


def test_augment_box_tracks_image_content():
    """Edge-coordinate boxes must rotate about w/2 (the image resampler
    works in index space about (w-1)/2): the brightness centroid of a
    small bright block must stay at the transformed box center within
    interpolation tolerance, for arbitrary random angles."""
    import jax
    from caesar_yolo_tpu.train.augment import augment_sample
    w = 96
    img = np.zeros((w, w, 1), np.float32)
    img[20:26, 60:66, 0] = 1.0  # bright block, off-center
    boxes = jnp.asarray([[60.0, 20.0, 66.0, 26.0]])
    mask = jnp.asarray([True])
    for seed in range(6):
        out, nb, m = augment_sample(
            jax.random.PRNGKey(seed), jnp.asarray(img), boxes, mask,
            degrees=180.0, scale=0.4, flipud=0.5, fliplr=0.5)
        out = np.asarray(out[:, :, 0], np.float64)
        nb = np.asarray(nb[0])
        if not bool(m[0]) or out.max() < 0.2:
            continue
        # threshold away both the 0 background and the 0.447 gray fill
        sig = np.clip(out - 0.6, 0, None)
        yy, xx = np.mgrid[0:w, 0:w]
        cx = (sig * (xx + 0.5)).sum() / sig.sum()
        cy = (sig * (yy + 0.5)).sum() / sig.sum()
        bx, by = (nb[0] + nb[2]) / 2, (nb[1] + nb[3]) / 2
        assert abs(cx - bx) < 1.0 and abs(cy - by) < 1.0, (
            seed, (cx, cy), (bx, by))


def test_augment_batch_box_tracks_image_content():
    """Same geometric-consistency property through the fast batched
    rot90+shear/scale resampler path (square images)."""
    import jax
    from caesar_yolo_tpu.train.augment import augment_batch
    w = 96
    img = np.zeros((2, w, w, 1), np.float32)
    img[0, 20:26, 60:66, 0] = 1.0
    img[1, 70:76, 30:36, 0] = 1.0
    boxes = jnp.asarray([[[60.0, 20.0, 66.0, 26.0]],
                         [[30.0, 70.0, 36.0, 76.0]]])
    mask = jnp.ones((2, 1), bool)
    for seed in range(4):
        out, nb, m = augment_batch(
            jax.random.PRNGKey(100 + seed), jnp.asarray(img), boxes, mask,
            degrees=180.0, scale=0.4, flipud=0.5, fliplr=0.5)
        for k in range(2):
            o = np.asarray(out[k, :, :, 0], np.float64)
            b = np.asarray(nb[k, 0])
            if not bool(m[k, 0]) or o.max() < 0.2:
                continue
            sig = np.clip(o - 0.6, 0, None)
            yy, xx = np.mgrid[0:w, 0:w]
            cx = (sig * (xx + 0.5)).sum() / sig.sum()
            cy = (sig * (yy + 0.5)).sum() / sig.sum()
            bx, by = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
            assert abs(cx - bx) < 1.2 and abs(cy - by) < 1.2, (
                seed, k, (cx, cy), (bx, by))


def test_cli_datalist_tiled_per_image_outfiles(tmp_path, monkeypatch):
    """--datalist + --split_img_in_tiles shares one compiled engine
    across images AND keeps per-image catalogs when a fixed
    --detect_outfile_json is given (a shared path silently kept only
    the last image's results)."""
    from caesar_yolo_tpu.cli.run import main
    from caesar_yolo_tpu.models.convert import save_params

    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        p = tmp_path / f"mos{i}.fits"
        write_fits(rng.random((96, 96), np.float32), str(p))
        paths.append(str(p))
    (tmp_path / "list.txt").write_text("\n".join(paths))
    m = build_model("yolov8n", num_classes=5)
    w = tmp_path / "w.npz"
    save_params(init_params(m, 0), str(w),
                meta={"model": "yolov8n", "num_classes": 5})
    monkeypatch.chdir(tmp_path)
    rc = main([f"--weights={w}", f"--datalist={tmp_path / 'list.txt'}",
               "--imgsize=64", "--scoreThr=0.001", "--batch_size=2",
               "--split_img_in_tiles", "--tile_xsize=64", "--tile_ysize=64",
               "--detect_outfile_json=cat.json"])
    assert rc == 0
    for i in range(2):
        assert (tmp_path / f"cat_mos{i}.json").exists()


def test_spool_rejected_on_different_image(tmp_path, tiny_model,
                                           galaxy_fits_path, monkeypatch):
    """A spool written for ANOTHER image (shared --spool_path across a
    datalist, or an auto-name basename collision) must be ignored: the
    grid signature carries the image path."""
    import shutil
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    other = tmp_path / "other_field.fits"
    shutil.copy(galaxy_fits_path, other)
    fake_obj = {"name": "S1_t0", "x1": 1.0, "x2": 5.0, "y1": 1.0,
                "y2": 5.0, "class_id": 1, "class_name": "compact",
                "score": 0.95, "edge": 0}
    spool = tmp_path / "shared.spool.jsonl"
    kw = dict(image_xmin=-1, image_xmax=-1, image_ymin=-1, image_ymax=-1,
              img_size=64, score_thr=0.9999, split_image_in_tiles=True,
              tile_xsize=66, tile_ysize=66, batch_size=4, resume=True,
              spool_path=str(spool))
    sf_other = SFinder(m, p, SFinderConfig(image_path=str(other), **kw))
    spool.write_text(
        json.dumps({"gridSig": sf_other._grid_signature()}) + "\n"
        + json.dumps(
            {"objs": [fake_obj], "tileId": 0, "workerId": 0,
             "neighborTileIds": [], "xmin": 0, "xmax": 66, "ymin": 0,
             "ymax": 66}) + "\n")
    sf = SFinder(m, p, SFinderConfig(image_path=galaxy_fits_path, **kw),
                 engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_galaxy0001.json").read_text())
    assert 0.95 not in {s["score"] for s in cat["sources"]}


def test_datalist_per_image_spool_path():
    """Datalist runs suffix a fixed --spool_path per image so one image's
    resume state never clobbers (or contaminates) another's."""
    from caesar_yolo_tpu.cli.run import _per_image_path
    assert _per_image_path("s.jsonl", "a/field.fits", 3) == "s_field.jsonl"
    assert _per_image_path("s.jsonl", "x.fits", 1) == "s.jsonl"
    assert _per_image_path("", "x.fits", 3) == ""


def test_spool_torn_tail_keeps_complete_results(tmp_path, tiny_model,
                                                galaxy_fits_path,
                                                monkeypatch):
    """A crash mid spool-write (the exact failure the spool exists to
    survive) leaves one torn trailing line; resume must keep every
    COMPLETE tile result and drop only the tail — not clear everything
    and recompute the whole run."""
    m, p = tiny_model
    monkeypatch.chdir(tmp_path)
    fake_obj = {"name": "S1_t0", "x1": 1.0, "x2": 5.0, "y1": 1.0,
                "y2": 5.0, "class_id": 1, "class_name": "compact",
                "score": 0.99, "edge": 0}
    cfg = SFinderConfig(
        image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
        image_ymin=-1, image_ymax=-1, img_size=64, score_thr=0.9999,
        split_image_in_tiles=True, tile_xsize=66, tile_ysize=66,
        batch_size=4, resume=True)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    spool = tmp_path / ".galaxy0001.tilespool.jsonl"
    spool.write_text(
        json.dumps({"gridSig": sf._grid_signature()}) + "\n"
        + json.dumps(
            {"objs": [fake_obj], "tileId": 0, "workerId": 0,
             "neighborTileIds": [], "xmin": 0, "xmax": 66, "ymin": 0,
             "ymax": 66}) + "\n"
        + '{"objs": [{"name": "S1_t1", "x1": 2.0, ')  # torn mid-write
    done = sf._load_spool(sf._grid_signature())
    assert set(done) == {0}  # complete line kept, torn tail dropped
    assert sf.run_tiled() == 0
    cat = json.loads((tmp_path / "catalog_galaxy0001.json").read_text())
    assert 0.99 in {s["score"] for s in cat["sources"]}


def test_spool_per_rank_suffix_and_stripe_signature(tmp_path, tiny_model,
                                                    galaxy_fits_path,
                                                    monkeypatch):
    """Multi-host: an EXPLICIT --spool_path gets the per-rank suffix too
    (N processes must never interleave appends into one file), and the
    grid signature carries the tid stripe so a resume under a different
    process count/index ignores the old spool instead of duplicating
    tiles the new stripe assigns to other ranks."""
    import jax as _jax
    m, p = tiny_model
    kw = dict(image_path=galaxy_fits_path, image_xmin=-1, image_xmax=-1,
              image_ymin=-1, image_ymax=-1, img_size=64,
              split_image_in_tiles=True, tile_xsize=66, tile_ysize=66,
              resume=True, spool_path=str(tmp_path / "run.jsonl"))
    sf = SFinder(m, p, SFinderConfig(**kw))
    sig1 = sf._grid_signature()
    assert sf._spool_file() == str(tmp_path / "run.jsonl")  # 1 process

    monkeypatch.setattr(_jax, "process_count", lambda: 4)
    monkeypatch.setattr(_jax, "process_index", lambda: 2)
    sf2 = SFinder(m, p, SFinderConfig(**kw))
    assert sf2._spool_file() == str(tmp_path / "run.p2.jsonl")
    sig2 = sf2._grid_signature()  # snapshot under index=2
    assert sig2 != sig1  # stripe is part of the sig
    monkeypatch.setattr(_jax, "process_index", lambda: 3)
    assert SFinder(m, p, SFinderConfig(**kw))._grid_signature() != sig2


def test_sfinder_serial_png_crop(tmp_path, monkeypatch, tiny_model):
    """A crop window on a PNG input must CROP the pixels, not just
    offset the output coordinates (the reference silently ignores crop
    for PNGs; honoring it requires slice + offset together)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from caesar_yolo_tpu.parallel import sfinder as sf_mod

    m, p = tiny_model
    rng = np.random.default_rng(0)
    png = tmp_path / "img.png"
    plt.imsave(str(png), rng.random((64, 64)), cmap="gray")
    monkeypatch.chdir(tmp_path)

    seen = {}
    real_predict = sf_mod.Analyzer.predict

    def spy(self, image, image_id, xmin=0, ymin=0, **kwargs):
        seen["shape"] = np.asarray(image).shape[:2]
        seen["origin"] = (xmin, ymin)
        return real_predict(self, image, image_id, xmin=xmin, ymin=ymin,
                            **kwargs)

    monkeypatch.setattr(sf_mod.Analyzer, "predict", spy)
    cfg = SFinderConfig(image_path=str(png), image_xmin=10, image_xmax=41,
                        image_ymin=8, image_ymax=39, img_size=32,
                        score_thr=1e-4)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run() == 0
    assert seen["shape"] == (32, 32)    # pixels actually cropped
    assert seen["origin"] == (10, 8)    # coords land in full-image frame
    # out-of-range window errors instead of silently mis-slicing
    bad = SFinderConfig(image_path=str(png), image_xmin=10, image_xmax=64,
                        image_ymin=8, image_ymax=39, img_size=32)
    assert SFinder(m, p, bad).run() == -1


def test_sfinder_serial_png_single_decode(tmp_path, monkeypatch,
                                          tiny_model):
    """Serial non-FITS runs must decode the image ONCE (the size probe
    in set_img_size_params is reused by run())."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from caesar_yolo_tpu.parallel import sfinder as sf_mod

    m, p = tiny_model
    rng = np.random.default_rng(0)
    png = tmp_path / "img.png"
    plt.imsave(str(png), rng.random((64, 64)), cmap="gray")
    monkeypatch.chdir(tmp_path)
    calls = []
    real = sf_mod.read_image
    monkeypatch.setattr(sf_mod, "read_image",
                        lambda path: calls.append(path) or real(path))
    cfg = SFinderConfig(image_path=str(png), image_xmin=-1, image_xmax=-1,
                        image_ymin=-1, image_ymax=-1, img_size=64,
                        score_thr=1e-4)
    sf = SFinder(m, p, cfg, engine_kwargs={"compute_dtype": jnp.float32})
    assert sf.run() == 0
    assert len(calls) == 1

def test_dataset_yaml_quoted_commas_and_multiline_flow(tmp_path):
    """Flow-list names containing commas stay one item, multi-line flow
    lists parse instead of silently dropping entries, and an
    unterminated quote raises instead of mis-aligning class ids
    (ADVICE r3, dataset.py)."""
    import pytest
    (tmp_path / "q.yaml").write_text(
        "train: images\nnames: ['radio, extended', compact, \"a, b\"]\n")
    spec = parse_dataset_yaml(str(tmp_path / "q.yaml"))
    assert spec["names"] == ["radio, extended", "compact", "a, b"]
    (tmp_path / "ml.yaml").write_text(
        "train: images\nnames: [spurious,\n  compact,\n"
        "  'extended, multi-island']\nval: images\n")
    spec = parse_dataset_yaml(str(tmp_path / "ml.yaml"))
    assert spec["names"] == ["spurious", "compact",
                             "extended, multi-island"]
    assert spec["val"] == "images"
    (tmp_path / "bad.yaml").write_text("names: ['oops, no close]\n")
    with pytest.raises(ValueError):
        parse_dataset_yaml(str(tmp_path / "bad.yaml"))
