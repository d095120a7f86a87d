"""Checkpoint conversion CLI.

    python -m caesar_yolo_tpu.cli.convert weights.pt [out.npz]
        [--model yolov8l] [--num_classes N]

The reference consumes ultralytics `.pt` files directly (scripts/
run.py:347 loads them through ultralytics); here the one-time
conversion to the framework's `.npz` format is a first-class command
(models/convert.py: ghost-module unpickler, no ultralytics install
needed, nc inferred from the head).  `cli.run --weights=w.pt` also
converts on the fly; this command persists the result.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("weights", help="ultralytics .pt checkpoint")
    ap.add_argument("out", nargs="?", default=None,
                    help="output .npz (default: <weights-stem>.npz)")
    ap.add_argument("--model", default=None,
                    help="architecture name (default: weights filename "
                         "stem, e.g. yolov8l)")
    ap.add_argument("--num_classes", type=int, default=None,
                    help="class count (default: inferred from the head)")
    args = ap.parse_args(argv)

    from caesar_yolo_tpu import logger
    from caesar_yolo_tpu.models.convert import convert_checkpoint

    out = args.out or os.path.splitext(args.weights)[0] + ".npz"
    try:
        convert_checkpoint(args.weights, out_path=out,
                           model_name=args.model,
                           num_classes=args.num_classes)
    except Exception as e:  # CLI boundary: any failure (corrupt pickle,
        # missing torch, bad key) exits 1 with a clean message, never a
        # raw traceback
        logger.error("Conversion failed: %s", e)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
