"""Command-line detection entry point.

Flag-compatible with the reference CLI (reference scripts/run.py:58-155)
so a caesar-yolo user can switch by changing the executable:

    python -m caesar_yolo_tpu.cli.run --image=img.fits \
        --weights=yolov8l.npz --scoreThr=0.5 \
        --preprocessing --zscale_stretch --normalize_minmax \
        [--split_img_in_tiles --tile_xsize=512 ...]

Differences from the reference (TPU-native redesign):
  - no mpirun: tiled runs shard tile batches over all visible TPU chips
    via the device mesh (--devices selects jax platforms instead of
    cuda ids).
  - --weights accepts a converted .npz (models/convert.py) or a raw
    ultralytics .pt (converted on the fly; needs torch on the host).
  - extra: --model (architecture name when not inferable), --batch_size.
"""

from __future__ import annotations

import argparse
import os
import sys

from caesar_yolo_tpu import logger
from caesar_yolo_tpu.cli.preproc_args import (
    add_preprocessing_args,
    build_preprocessor_from_args,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="caesar-yolo-tpu options")

    # DATA
    parser.add_argument("--image", required=False, type=str, default="",
                        help="Input image (FITS/PNG/JPG) to detect on")
    parser.add_argument("--datalist", required=False, default="",
                        help="Filelist of images for batch detection")
    parser.add_argument("--maxnimgs", required=False, type=int, default=-1)

    # MODEL
    parser.add_argument("--weights", required=True,
                        help="Converted .npz weights (or ultralytics .pt)")
    parser.add_argument("--model", required=False, default="",
                        help="Architecture name (default: from weights name)")

    # PREPROCESSING (shared flag set: cli/preproc_args.py)
    parser.add_argument("--imgsize", type=int, default=640)
    add_preprocessing_args(parser)

    # DETECT
    parser.add_argument("--scoreThr", type=float, default=0.7)
    parser.add_argument("--iouThr", type=float, default=0.5)
    parser.add_argument("--pre_nms", type=int, default=512,
                        help="Pre-NMS candidate window (above-threshold "
                        "candidates beyond it are dropped WITH a log; "
                        "raise for crowded fields)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume a crashed tiled run from its "
                        "per-tile spool (ignored when the tiling/"
                        "detection config changed)")
    parser.add_argument("--spool_path", type=str, default="",
                        help="Tile-result spool file (default: auto "
                        "per image+process)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="Write a jax.profiler trace of the run "
                        "into this directory")
    parser.add_argument("--device_tiling", choices=["auto", "on", "off"],
                        default="auto",
                        help="Ship the mosaic to HBM once and extract "
                        "tile windows on-device (auto: when the mosaic "
                        "fits the HBM cap; overlapping grids ship up to "
                        "4x fewer host->device bytes)")
    parser.add_argument("--preproc_context", choices=["tile", "global"],
                        default="tile",
                        help="Statistics context for tiled-run "
                        "preprocessing: 'tile' computes stretch/"
                        "normalize statistics per tile (reference "
                        "parity, evaluation.py:157-161 per window); "
                        "'global' preprocesses the whole device-"
                        "resident mosaic once so every tile sees the "
                        "serial whole-image pixel values (needs "
                        "device tiling)")
    parser.add_argument("--relay_bf16", action="store_true",
                        help="Ship tiles to the device as bfloat16 "
                        "(half the host->device bytes; ~0.4%% pixel "
                        "rounding — use when the host link, not the "
                        "chip, bounds throughput)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ inference: quantize dense convs "
                        "after calibrating activation ranges on samples "
                        "from the input image (models/quant.py; wins on "
                        "l/x scales, quality-gated in tests)")
    parser.add_argument("--merge_overlap_iou_thr_soft", type=float,
                        default=0.3)
    parser.add_argument("--merge_overlap_iou_thr_hard", type=float,
                        default=0.8)
    parser.add_argument("--xmin", type=int, default=-1)
    parser.add_argument("--xmax", type=int, default=-1)
    parser.add_argument("--ymin", type=int, default=-1)
    parser.add_argument("--ymax", type=int, default=-1)

    # TILING / PARALLEL
    parser.add_argument("--split_img_in_tiles", action="store_true")
    parser.add_argument("--tile_xsize", type=int, default=512)
    parser.add_argument("--tile_ysize", type=int, default=512)
    parser.add_argument("--tile_xstep", type=float, default=1.0)
    parser.add_argument("--tile_ystep", type=float, default=1.0)
    parser.add_argument("--max_ntasks_per_worker", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=128,
                        help="tiles per compiled device batch (128 is the "
                        "v5e sweet spot; small mosaics pad up to it)")

    # RUN
    parser.add_argument("--devices", type=str, default="",
                        help="jax platform override (e.g. cpu, tpu)")
    parser.add_argument("--multigpu", action="store_true",
                        help="(compat no-op: the mesh always uses all chips)")

    # DRAW / SAVE
    parser.add_argument("--draw_plots", action="store_true")
    parser.add_argument("--draw_class_label_in_caption", action="store_true")
    parser.add_argument("--save_plots", action="store_true")
    parser.add_argument("--save_tile_catalog", action="store_true")
    parser.add_argument("--save_tile_region", action="store_true")
    parser.add_argument("--save_tile_img", action="store_true")
    parser.add_argument("--detect_outfile", type=str, default="")
    parser.add_argument("--detect_outfile_json", type=str, default="")

    return parser.parse_args(argv)


def validate_args(args) -> int:
    """Reference validation rules (scripts/run.py:158-190)."""
    if args.datalist:
        if not os.path.isfile(args.datalist):
            logger.error("Datalist %s not existing!", args.datalist)
            return -1
        if not args.weights or not os.path.isfile(args.weights):
            logger.error("Given weight file %s not existing or not a file!",
                         args.weights)
            return -1
        return 0
    if not args.image:
        logger.error("Argument --image is required for detect task!")
        return -1
    if not os.path.isfile(args.image):
        logger.error("Image argument must be an existing image on "
                     "filesystem!")
        return -1
    if not args.image.endswith((".fits", ".png", ".jpg")):
        logger.error("Image must have .fits/.png/.jpg extension!")
        return -1
    if args.maxnimgs == 0 or (args.maxnimgs < 0 and args.maxnimgs != -1):
        logger.error("Invalid maxnimgs given (hint: give -1 or >0)!")
        return -1
    if not args.weights or not os.path.isfile(args.weights):
        logger.error("Given weight file %s not existing or not a file!",
                     args.weights)
        return -1
    return 0


# canonical definition lives in cli/preproc_args.py (shared with
# evaluate/export); re-exported here for existing importers


def load_model_and_params(args):
    from caesar_yolo_tpu.models.convert import convert_checkpoint, load_params
    from caesar_yolo_tpu.models.yolo import build_model
    name = args.model or os.path.splitext(os.path.basename(args.weights))[0]
    if args.weights.endswith(".pt"):
        return convert_checkpoint(args.weights, model_name=args.model or None)
    params, meta = load_params(args.weights)
    model = build_model(meta.get("model", name),
                        num_classes=int(meta.get("num_classes", 5)))
    return model, params


def quantize_from_image(model, params, image_path, preproc, img_size):
    """int8 PTQ for the CLI: calibrate activation ranges on up-to-3
    square crops of the INPUT image itself (the serving distribution),
    then quantize (models/quant.py).  Returns params for engines built
    with fuse=False."""
    import numpy as np

    from caesar_yolo_tpu.evaluation.evaluate import load_eval_image
    from caesar_yolo_tpu.models.quant import (calibration_inputs_from_tiles,
                                              quantize_model)

    a = load_eval_image(image_path)
    if a is None:
        raise ValueError(f"cannot read calibration image {image_path}")
    if a.ndim == 2:
        a = a[..., None]
    h, w = a.shape[:2]
    s = min(h, w, 640)
    corners = {(0, 0), (h - s, w - s), ((h - s) // 2, (w - s) // 2)}
    tiles = np.stack([a[cy:cy + s, cx:cx + s] for cy, cx in sorted(corners)])
    calib = calibration_inputs_from_tiles(
        tiles, preprocessor=preproc, img_size=img_size,
        nchan=model.in_channels)
    logger.info("int8 PTQ: calibrated on %d %dpx crops of %s",
                len(tiles), s, image_path)
    return quantize_model(model, params, calib)


def _per_image_path(template: str, path: str, n_images: int) -> str:
    """Fixed per-run file overrides (outfiles, spool) get the image stem
    appended for datalists — a shared path would silently keep only the
    LAST image's data (and a shared spool would lose every other image's
    resume state)."""
    if not template or n_images == 1:
        return template
    stem = os.path.splitext(os.path.basename(path))[0]
    base, ext = os.path.splitext(template)
    return f"{base}_{stem}{ext}"


def run_datalist_tiled(model, params, cfg, images, preproc, mesh,
                       engine_kwargs=None) -> int:
    """Tiled detection over a datalist, sharing ONE compiled TileEngine
    (and its jit cache) across all images."""
    from dataclasses import replace

    from caesar_yolo_tpu.parallel import SFinder

    status = 0
    engine = None
    n = len(images)
    for path in images:
        sf = SFinder(model, params,
                     replace(cfg, image_path=path,
                             outfile_json=_per_image_path(
                                 cfg.outfile_json, path, n),
                             outfile_ds9=_per_image_path(
                                 cfg.outfile_ds9, path, n),
                             spool_path=_per_image_path(
                                 cfg.spool_path, path, n)),
                     preprocessor=preproc, mesh=mesh, engine=engine,
                     engine_kwargs=engine_kwargs)
        rc = sf.run_tiled()
        engine = sf._engine
        if rc != 0:
            logger.error("Detection failed on %s, continuing", path)
            status = 1
    return status


def run_datalist_serial(model, params, cfg, images, preproc,
                        engine_kwargs=None) -> int:
    """Per-image Analyzer datalist path (plots, crops, outfile overrides)
    sharing ONE compiled Predictor across images."""
    from dataclasses import replace

    from caesar_yolo_tpu.parallel import SFinder

    status = 0
    predictor = None
    n = len(images)
    for path in images:
        sf = SFinder(model, params,
                     replace(cfg, image_path=path,
                             outfile_json=_per_image_path(
                                 cfg.outfile_json, path, n),
                             outfile_ds9=_per_image_path(
                                 cfg.outfile_ds9, path, n)),
                     preprocessor=preproc, predictor=predictor,
                     engine_kwargs=engine_kwargs)
        rc = sf.run()
        predictor = sf._predictor
        if rc != 0:
            logger.error("Detection failed on %s, continuing", path)
            status = 1
    return status


def run_datalist_batched(model, params, cfg, images, preproc,
                         engine_kwargs=None) -> int:
    """Whole-image detection over a datalist, batched by shape through
    one compiled program per shape (the reference dispatches the model
    once per image, macros/make_prediction.py:645-658)."""
    import time

    from caesar_yolo_tpu.detect.batch import BatchedDetector
    from caesar_yolo_tpu.detect.merge import merge_detections
    from caesar_yolo_tpu.evaluation.evaluate import load_eval_image
    from caesar_yolo_tpu.outputs.catalog import (
        make_json_results,
        make_objects,
        write_json,
    )
    from caesar_yolo_tpu.outputs.ds9 import write_ds9_regions

    t0 = time.time()
    detector = BatchedDetector(
        model, params, preprocessor=preproc, img_size=cfg.img_size,
        score_thr=cfg.score_thr, iou_thr=cfg.iou_thr, pre_nms=cfg.pre_nms,
        batch_size=cfg.batch_size, relay_dtype=cfg.relay_dtype,
        **(engine_kwargs or {}))
    shapes = {}

    def load(p):
        img = load_eval_image(p)
        if img is not None:
            shapes[p] = img.shape[:2]
        return img

    detections = detector.detect_many(images, load)
    status = 0
    n_total = 0
    for path in images:
        det = detections.get(path)
        image_id = os.path.splitext(os.path.basename(path))[0]
        if det is None:
            logger.error("Detection failed on %s, continuing", path)
            status = 1
            continue
        boxes, scores, cls, ok = det
        if not ok:
            # match the per-image Analyzer path (and the reference's
            # failed-read behavior): no outputs written, nonzero exit
            logger.warning("Image %s degenerate, no prediction", path)
            status = 1
            continue
        boxes, scores, cls = merge_detections(
            boxes, scores, cls, soft_thr=cfg.merge_overlap_iou_thr_soft,
            hard_thr=cfg.merge_overlap_iou_thr_hard)
        objs = make_objects(boxes, scores, cls, image_shape=shapes[path],
                            class_names=cfg.class_names)
        n_total += len(objs)
        if cfg.save_catalog:
            write_json(make_json_results(image_id, objs),
                       f"out_{image_id}.json")
        if cfg.save_region:
            write_ds9_regions(objs, f"out_{image_id}.reg")
    logger.info("Datalist done: %d images, %d objects (%.2fs)",
                len(images), n_total, time.time() - t0)
    return status


def enable_compilation_cache():
    """Persistent XLA compilation cache: repeat CLI invocations (the
    reference's workflow is many short runs) skip recompiling the
    detection programs.  Opt out with CAESAR_YOLO_NO_COMPILE_CACHE=1."""
    if os.environ.get("CAESAR_YOLO_NO_COMPILE_CACHE"):
        return
    import jax
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "caesar_yolo_tpu", "xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        logger.warning("compilation cache disabled (%s)", e)


def main(argv=None) -> int:
    args = parse_args(argv)
    if validate_args(args) < 0:
        return 1

    if args.devices:
        import jax
        try:
            jax.config.update("jax_platforms", args.devices)
        except RuntimeError:
            logger.warning("jax backends already initialized; --devices "
                           "ignored")
    enable_compilation_cache()

    from caesar_yolo_tpu.parallel import SFinder, SFinderConfig, make_mesh

    model, params = load_model_and_params(args)
    preproc = build_preprocessor_from_args(args)

    engine_kwargs = None
    if args.int8:
        calib_image = args.image
        if args.datalist:
            first = [p.strip() for p in open(args.datalist) if p.strip()]
            calib_image = first[0] if first else ""
        params = quantize_from_image(model, params, calib_image, preproc,
                                     args.imgsize)
        engine_kwargs = {"fuse": False}

    cfg = SFinderConfig(
        image_path=args.image,
        image_xmin=args.xmin, image_xmax=args.xmax,
        image_ymin=args.ymin, image_ymax=args.ymax,
        img_size=args.imgsize, score_thr=args.scoreThr,
        iou_thr=args.iouThr, pre_nms=args.pre_nms,
        relay_dtype="bfloat16" if args.relay_bf16 else "float32",
        device_tiling=args.device_tiling,
        preproc_context=args.preproc_context,
        resume=args.resume, spool_path=args.spool_path,
        profile_dir=args.profile_dir,
        merge_overlap_iou_thr_soft=args.merge_overlap_iou_thr_soft,
        merge_overlap_iou_thr_hard=args.merge_overlap_iou_thr_hard,
        split_image_in_tiles=args.split_img_in_tiles,
        tile_xsize=args.tile_xsize, tile_ysize=args.tile_ysize,
        tile_xstep=args.tile_xstep, tile_ystep=args.tile_ystep,
        max_ntasks_per_worker=args.max_ntasks_per_worker,
        batch_size=args.batch_size,
        save_tile_catalog=args.save_tile_catalog,
        save_tile_region=args.save_tile_region,
        save_tile_img=args.save_tile_img,
        draw_plot=args.draw_plots, save_plot=args.save_plots,
        draw_class_label_in_caption=args.draw_class_label_in_caption,
        outfile_json=args.detect_outfile_json,
        outfile_ds9=args.detect_outfile)

    mesh = make_mesh() if args.split_img_in_tiles else None

    if args.datalist:
        images = [p.strip() for p in open(args.datalist) if p.strip()]
        if args.maxnimgs > 0:
            images = images[:args.maxnimgs]
        if args.split_img_in_tiles:
            return run_datalist_tiled(model, params, cfg, images,
                                      preproc, mesh, engine_kwargs)
        # plots / crop windows / explicit outfile overrides need the full
        # per-image Analyzer path; plain catalog runs take the batched
        # compile-once path
        needs_analyzer = (args.draw_plots or args.save_plots
                          or args.detect_outfile or args.detect_outfile_json
                          or (args.xmin >= 0 and args.xmax > 0
                              and args.ymin >= 0 and args.ymax > 0))
        if needs_analyzer:
            return run_datalist_serial(model, params, cfg, images, preproc,
                                       engine_kwargs)
        return run_datalist_batched(model, params, cfg, images, preproc,
                                    engine_kwargs)

    sf = SFinder(model, params, cfg, preprocessor=preproc, mesh=mesh,
                 engine_kwargs=engine_kwargs)
    rc = sf.run_tiled() if args.split_img_in_tiles else sf.run()
    return 0 if rc == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
