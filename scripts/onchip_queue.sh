#!/usr/bin/env bash
# Round-3 on-chip measurement queue — run when the TPU tunnel is up.
# One TPU process at a time (concurrent runs corrupt timings / can crash
# the worker); every step logs to $LOG and failures don't stop the queue
# (remote-compile contention shows up as 560s+ hangs — rerun the step).
#
#   bash scripts/onchip_queue.sh [logfile]
#
# Steps:
#   1 sanity          jax.devices() must show the axon TPU
#   2 flagship        default bench (yolov8n e2e) — regression check
#   3 upsample-probe  isolated 2x-upsample formulation A/B
#   4 upsample-e2e    CY_UPSAMPLE={repeat,broadcast,einsum} through
#                     yolo11l + yolov8n full-pipeline bench (in-graph
#                     delta methodology, STATUS note 1) -> note 10
#   5 mosaic-ab       BENCH_MODE=mosaic: device tiling vs windowed
#                     reads at step 1.0 and 0.5
#   6 train           BENCH_MODE=train (+BENCH_AUG=1) re-measure after
#                     the round-3 hardening fixes (STATUS 15-19)
#   7 train-quality   scripts/train_synth_demo.py 1500 96 (C/R re-proof)
#   8 eval            BENCH_MODE=eval regression check

set -u
cd "$(dirname "$0")/.."
LOG="${1:-onchip_r3.log}"
T=900

step() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG"
  local out rc
  out=$(timeout "$T" env "$@" 2>&1); rc=$?
  echo "$out" | tail -6 | tee -a "$LOG"
  echo "--- [$name] rc=$rc ---" | tee -a "$LOG"
}

step sanity           python -c "import jax; print(jax.devices())"
step flagship         python bench.py
step upsample-probe   python scripts/probe_upsample.py
step up-e2e-11l-rep   BENCH_MODEL=yolo11l CY_UPSAMPLE=repeat    python bench.py
step up-e2e-11l-bc    BENCH_MODEL=yolo11l CY_UPSAMPLE=broadcast python bench.py
step up-e2e-11l-ein   BENCH_MODEL=yolo11l CY_UPSAMPLE=einsum    python bench.py
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
