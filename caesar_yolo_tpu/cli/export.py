"""Serving-artifact export entry point.

    python -m caesar_yolo_tpu.cli.export --weights=W.npz \
        --out=detector.cyx --batch=128 --tile_xsize=640 --tile_ysize=640 \
        [--imgsize=640 --scoreThr=0.25 --iouThr=0.5] [preproc flags...] \
        [--platforms=tpu,cpu]

Freezes the full detect step (preprocess -> letterbox -> forward ->
decode -> NMS) with the weights embedded into one portable jax.export
blob; a serving process loads it with `deploy.load_detector` and needs
no model code (see deploy.py).  The reference has no equivalent — it
serves by reinstalling ultralytics+torch around the `.pt` file.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="caesar-yolo-tpu serving export")
    p.add_argument("--weights", required=True)
    p.add_argument("--model", default="")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--tile_xsize", type=int, default=640)
    p.add_argument("--tile_ysize", type=int, default=640)
    p.add_argument("--nchannels", type=int, default=1,
                   help="input tile channels (gray FITS tiles = 1)")
    p.add_argument("--imgsize", type=int, default=640)
    p.add_argument("--scoreThr", type=float, default=0.25)
    p.add_argument("--iouThr", type=float, default=0.5)
    p.add_argument("--max_det", type=int, default=300)
    p.add_argument("--pre_nms", type=int, default=512)
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--preprocessing", action="store_true")
    p.add_argument("--zscale_stretch", action="store_true")
    p.add_argument("--normalize_minmax", action="store_true")
    p.add_argument("--chan3_preproc", action="store_true")
    p.add_argument("--sigma_clip_low", type=float, default=1.0)
    p.add_argument("--sigma_clip_up", type=float, default=20.0)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from caesar_yolo_tpu import logger
    from caesar_yolo_tpu.cli.run import load_model_and_params
    from caesar_yolo_tpu.deploy import export_detector
    from caesar_yolo_tpu.ops import build_preprocessor

    model, params = load_model_and_params(args)
    preproc = None
    if args.preprocessing:
        preproc = build_preprocessor(
            zscale_stretch=args.zscale_stretch,
            normalize_minmax=args.normalize_minmax,
            chan3_preproc=args.chan3_preproc,
            sigma_clip_low=args.sigma_clip_low,
            sigma_clip_up=args.sigma_clip_up)
    platforms = tuple(s for s in args.platforms.split(",") if s) or None
    blob = export_detector(
        model, params, preprocessor=preproc,
        tile_shape=(args.tile_ysize, args.tile_xsize, args.nchannels),
        batch=args.batch, img_size=args.imgsize, score_thr=args.scoreThr,
        iou_thr=args.iouThr, max_det=args.max_det, pre_nms=args.pre_nms,
        platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    logger.info("Exported %d-tile %dx%d detector to %s (%.1f MB)",
                args.batch, args.tile_ysize, args.tile_xsize, args.out,
                len(blob) / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
