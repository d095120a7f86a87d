#!/bin/bash
# Serial end-to-end smoke (the reference's test/run_inference.sh analog,
# same preprocessing/threshold config).  Weights default to the trained
# synthetic fixture; point WEIGHTFILE at a converted .npz (or raw .pt)
# for real radio-galaxy checkpoints.
set -e
cd "$(dirname "$0")/.."

INPUTFILE="${INPUTFILE:-/root/reference/test/galaxy0001.fits}"
WEIGHTFILE="${WEIGHTFILE:-tests/fixtures/yolov8n_synth96.npz}"
IMGSIZE="${IMGSIZE:-640}"
PREPROC_OPTS="--imgsize=$IMGSIZE --preprocessing --zscale_stretch --zscale_contrasts=0.25,0.25,0.25 --normalize_minmax --norm_min=0 --norm_max=255"
SCORE_THR="${SCORE_THR:-0.5}"
DET_OPTS="--scoreThr=$SCORE_THR --merge_overlap_iou_thr_soft=0.3 --merge_overlap_iou_thr_hard=0.8"
DRAW_OPTS="--draw_plots --save_plots --draw_class_label_in_caption"

python -m caesar_yolo_tpu.cli.run --image="$INPUTFILE" --weights="$WEIGHTFILE" \
  $PREPROC_OPTS $DET_OPTS $DRAW_OPTS "$@"
