#!/bin/bash
# 11n rate-delta bisect (VERDICT r4 weak #1 / next #2): attribute the
# round-3 -> round-4 yolo11n tile-rate move (+9.8%, 6087 -> 6646-6682)
# to its mechanism.  Candidates: broadcast-upsample default
# (CY_UPSAMPLE), the Pallas C2PSA attention (CY_ATTN bisect hook), or
# backend/jax drift (neither toggle moves the rate).  Each leg is one
# bench.py invocation (fresh process, so the env toggles re-trace).
set -e
cd "$(dirname "$0")/.."
echo "== default (broadcast upsample + Pallas attention) =="
BENCH_MODEL=yolo11n python bench.py
echo "== CY_UPSAMPLE=repeat (round-3-default upsample) =="
BENCH_MODEL=yolo11n CY_UPSAMPLE=repeat python bench.py
echo "== CY_ATTN=einsum (XLA attention formulation) =="
BENCH_MODEL=yolo11n CY_ATTN=einsum python bench.py
echo "== both round-3 settings =="
BENCH_MODEL=yolo11n CY_UPSAMPLE=repeat CY_ATTN=einsum python bench.py
