#!/usr/bin/env bash
# Round-3 on-chip queue #2: scale/imgsize coverage + the reference's
# flagship TRAINING recipe (yolov8l@640 batch 16, macros/run_train.py).
#
#   bash scripts/onchip_queue2.sh [logfile]
#
# Groups:
#   A e2e tile throughput at every remaining scale (s/m/x, both
#     families) at the standard B=128@640 — completes the measured
#     analog of the reference README scale table.
#   B int8 PTQ on the x scales (predicted to win like v8l did).
#   C imgsize grid at l scale (128/256/512/1024) — the reference
#     README table's other rows.  1024px drops to B=64 for HBM.
#   D training at the reference flagship recipe: yolov8l@640 b16,
#     with and without remat, plus the augmented variant.
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

# A: remaining scales
step e2e-8s   BENCH_MODEL=yolov8s python bench.py
step e2e-8m   BENCH_MODEL=yolov8m python bench.py
step e2e-8x   BENCH_MODEL=yolov8x python bench.py
step e2e-11s  BENCH_MODEL=yolo11s python bench.py
step e2e-11m  BENCH_MODEL=yolo11m python bench.py
step e2e-11x  BENCH_MODEL=yolo11x python bench.py

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

echo "=== queue2 done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
