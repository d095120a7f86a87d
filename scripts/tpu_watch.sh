#!/usr/bin/env bash
# Poll for the axon TPU tunnel; when jax.devices() answers with a TPU,
# run the round-3 on-chip measurement queue exactly once.
#   bash scripts/tpu_watch.sh [poll_seconds]
set -u
cd "$(dirname "$0")/.."
POLL="${1:-240}"
while true; do
  out=$(timeout 90 python -c "import jax; ds=jax.devices(); print(ds[0].platform, len(ds))" 2>/dev/null)
  if [[ "$out" == tpu* ]]; then
    echo "$(date -u +%H:%M:%S) TPU up: $out — running queue"
    bash scripts/onchip_queue.sh onchip_r3.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU not reachable (got: '$out'); retry in ${POLL}s"
  sleep "$POLL"
done
