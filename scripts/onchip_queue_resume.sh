#!/usr/bin/env bash
# Resume of scripts/onchip_queue.sh from the step where the prior session was
# killed (up-e2e-8n-bc onward). Same logging discipline: one TPU process at a
# time, failures don't stop the queue.
#
#   bash scripts/onchip_queue_resume.sh [logfile]

set -u
cd "$(dirname "$0")/.."
LOG="${1:-onchip_r3b.log}"
T=900

step() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
  local out rc
  out=$(timeout "$T" env "$@" 2>&1); rc=$?
  echo "$out" | tail -6 | tee -a "$LOG"
  echo "--- [$name] rc=$rc ---" | tee -a "$LOG"
}

step up-e2e-8n-bc     BENCH_MODEL=yolov8n CY_UPSAMPLE=broadcast python bench.py
step mosaic-dev-s1    BENCH_MODE=mosaic python bench.py
step mosaic-host-s1   BENCH_MODE=mosaic BENCH_DEVICE_TILING=0 python bench.py
step mosaic-dev-s05   BENCH_MODE=mosaic BENCH_STEP=0.5 python bench.py
step mosaic-host-s05  BENCH_MODE=mosaic BENCH_STEP=0.5 BENCH_DEVICE_TILING=0 python bench.py
step train            BENCH_MODE=train python bench.py
step train-aug        BENCH_MODE=train BENCH_AUG=1 python bench.py
step train-quality    python scripts/train_synth_demo.py 1500 96
step eval             BENCH_MODE=eval python bench.py

echo "=== queue done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
