"""Dataset evaluation entry point (the reference's make_prediction macro).

    python -m caesar_yolo_tpu.cli.evaluate --weights=W.npz \
        --filelist=imgs.txt [--label_dir=labels/] [preproc flags...]

Computes completeness / reliability / F1 with the reference's IoU>=0.6
matching rules (reference macros/make_prediction.py:553-694).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="caesar-yolo-tpu evaluation")
    p.add_argument("--weights", required=True)
    p.add_argument("--model", default="")
    p.add_argument("--filelist", required=True,
                   help="text file with one image path per line")
    p.add_argument("--label_dir", default="",
                   help="directory of YOLO-format label txts (default: "
                        "sibling labels/ dirs)")
    p.add_argument("--imgsize", type=int, default=640)
    p.add_argument("--scoreThr", type=float, default=0.25)
    p.add_argument("--iouThr_nms", type=float, default=0.5)
    p.add_argument("--iouThr_match", type=float, default=0.6)
    p.add_argument("--merge_overlap_iou_thr_soft", type=float, default=0.3)
    p.add_argument("--merge_overlap_iou_thr_hard", type=float, default=0.8)
    p.add_argument("--maxnimgs", type=int, default=-1)
    p.add_argument("--pre_nms", type=int, default=512)
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ inference calibrated on the first "
                        "filelist image (models/quant.py)")
    p.add_argument("--batch_size", type=int, default=32,
                   help="images per compiled device batch")
    p.add_argument("--save_detail", default="",
                   help="write per-image match detail JSON here")
    p.add_argument("--save_plot", default="",
                   help="write a per-class C/R/F1 bar figure here (.png)")
    from caesar_yolo_tpu.cli.preproc_args import add_preprocessing_args
    add_preprocessing_args(p)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from caesar_yolo_tpu.cli.run import (
        enable_compilation_cache,
        load_model_and_params,
    )
    enable_compilation_cache()
    from caesar_yolo_tpu.evaluation import evaluate_dataset

    model, params = load_model_and_params(args)
    engine_kwargs = {}
    from caesar_yolo_tpu.cli.preproc_args import build_preprocessor_from_args
    preproc = build_preprocessor_from_args(args)
    if args.int8:
        from caesar_yolo_tpu.cli.run import quantize_from_image
        first = [p_.strip() for p_ in open(args.filelist) if p_.strip()]
        params = quantize_from_image(model, params,
                                     first[0] if first else "", preproc,
                                     args.imgsize)
        engine_kwargs = {"fuse": False}
    report = evaluate_dataset(
        model, params, args.filelist,
        label_dir=args.label_dir or None, preprocessor=preproc,
        img_size=args.imgsize, score_thr=args.scoreThr,
        nms_iou_thr=args.iouThr_nms, pre_nms=args.pre_nms,
        batch_size=args.batch_size,
        soft_merge_thr=args.merge_overlap_iou_thr_soft,
        hard_merge_thr=args.merge_overlap_iou_thr_hard,
        iou_thr=args.iouThr_match, max_images=args.maxnimgs,
        detail_out=args.save_detail, plot_out=args.save_plot,
        **engine_kwargs)
    print(report.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
