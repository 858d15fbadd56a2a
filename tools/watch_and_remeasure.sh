#!/bin/bash
# Poll the TPU backend (the axon tunnel flaps — outages observed from
# minutes to hours); the moment it answers, run the queued on-chip
# measurement sequence (tools/onchip_remeasure.sh) ONCE and exit.
#
# Usage: bash tools/watch_and_remeasure.sh [logfile]
# The probe runs in a throwaway subprocess because a dead tunnel hangs
# the first backend init in native code (SIGTERM-immune; needs SIGKILL).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip_remeasure.log}
while true; do
  if timeout -k 5 150 python -c \
      "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))" \
      >/dev/null 2>&1; then
    echo "=== backend up at $(date) — starting remeasure ===" | tee -a "$LOG"
    bash tools/onchip_remeasure.sh 2>&1 | tee -a "$LOG"
    echo "=== remeasure finished at $(date) ===" | tee -a "$LOG"
    exit 0
  fi
  echo "backend down at $(date)" >> "$LOG"
  sleep 60
done
