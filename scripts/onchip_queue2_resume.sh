#!/usr/bin/env bash
# Resume of scripts/onchip_queue2.sh from the step where the prior session
# was killed (int8-8x onward). Same logging discipline: one TPU process at
# a time, failures don't stop the queue.
#
#   bash scripts/onchip_queue2_resume.sh [logfile]

set -u
cd "$(dirname "$0")/.."
LOG="${1:-onchip_r3c.log}"
T=900

step() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
  local out rc
  out=$(timeout "$T" env "$@" 2>&1); rc=$?
  echo "$out" | tail -6 | tee -a "$LOG"
  echo "--- [$name] rc=$rc ---" | tee -a "$LOG"
}

# B: int8 on the MXU-bound x scales
step int8-8x  BENCH_MODEL=yolov8x BENCH_QUANT=1 python bench.py
step int8-11x BENCH_MODEL=yolo11x BENCH_QUANT=1 python bench.py

# C: imgsize grid at l scale (reference README rows 128/256/512/1024)
step sz128-8l  BENCH_MODEL=yolov8l BENCH_IMGSZ=128 python bench.py
step sz128b-8l BENCH_MODEL=yolov8l BENCH_IMGSZ=128 BENCH_BATCH=512 python bench.py
step sz256-8l  BENCH_MODEL=yolov8l BENCH_IMGSZ=256 python bench.py
step sz512-8l  BENCH_MODEL=yolov8l BENCH_IMGSZ=512 python bench.py
step sz1024-8l BENCH_MODEL=yolov8l BENCH_IMGSZ=1024 BENCH_BATCH=64 python bench.py
step sz512-11l BENCH_MODEL=yolo11l BENCH_IMGSZ=512 python bench.py

# D: flagship training recipe (reference macros/run_train.py:11,20-45)
step train-8l        BENCH_MODE=train BENCH_MODEL=yolov8l python bench.py
step train-8l-remat  BENCH_MODE=train BENCH_MODEL=yolov8l BENCH_REMAT=1 python bench.py
step train-8l-aug    BENCH_MODE=train BENCH_MODEL=yolov8l BENCH_AUG=1 python bench.py

echo "=== queue2-resume done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
