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
    # (--nchannels comes from the shared preprocessing flag set and
    # also sets the input tile channel count)
    p.add_argument("--imgsize", type=int, default=640)
    p.add_argument("--scoreThr", type=float, default=0.25)
    p.add_argument("--iouThr", type=float, default=0.5)
    p.add_argument("--max_det", type=int, default=300)
    p.add_argument("--pre_nms", type=int, default=512)
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    from caesar_yolo_tpu.cli.preproc_args import add_preprocessing_args
    add_preprocessing_args(p)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from caesar_yolo_tpu import logger
    from caesar_yolo_tpu.cli.preproc_args import build_preprocessor_from_args
    from caesar_yolo_tpu.cli.run import load_model_and_params
    from caesar_yolo_tpu.deploy import export_detector

    model, params = load_model_and_params(args)
    preproc = build_preprocessor_from_args(args)
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
