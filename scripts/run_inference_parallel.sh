#!/bin/bash
# Tiled/distributed end-to-end smoke (the reference's
# test/run_inference_parallel.sh analog).  Where the reference runs
# `mpirun -np 4` python processes, this framework shards tile BATCHES
# over every chip of the jax mesh in ONE process — multi-host runs
# launch one process per host with jax.distributed (tile-id striping +
# payload allgather; see tests/test_multiprocess.py for the 2-process
# localhost analog).
set -e
cd "$(dirname "$0")/.."

INPUTFILE="${INPUTFILE:?set INPUTFILE to a mosaic FITS path}"
WEIGHTFILE="${WEIGHTFILE:-tests/fixtures/yolov8n_synth96.npz}"
TILE_SIZE="${TILE_SIZE:-256}"
TILE_STEP="${TILE_STEP:-1}"
RUN_OPTS="--max_ntasks_per_worker=1000 --split_img_in_tiles \
  --tile_xsize=$TILE_SIZE --tile_ysize=$TILE_SIZE \
  --tile_xstep=$TILE_STEP --tile_ystep=$TILE_STEP"
IMGSIZE="${IMGSIZE:-640}"
PREPROC_OPTS="--preprocessing --imgsize=$IMGSIZE --zscale_stretch --zscale_contrasts=0.25,0.25,0.25 --normalize_minmax --norm_min=0 --norm_max=255"
DET_OPTS="--scoreThr=${SCORE_THR:-0.5} --merge_overlap_iou_thr_soft=0.3 --merge_overlap_iou_thr_hard=0.8"

echo "INFO: Starting tiled inference run ..."
date
python -m caesar_yolo_tpu.cli.run --image="$INPUTFILE" --weights="$WEIGHTFILE" \
  $RUN_OPTS $PREPROC_OPTS $DET_OPTS "$@"
date
