#!/bin/bash
# Retry the axon chip claim until it succeeds, then run the queued
# round-4 validation stack (BASELINE.md "Round 4" order):
#   1. tools/validate_on_tpu.py   (stages 7+ have never touched hardware)
#   2. tools/prime_tpu_cache.py   (re-seed .jax_cache for the driver bench)
# Exits 0 after the stack runs (regardless of stage outcomes — the log
# carries per-stage results), so a supervising session gets notified.
#
# Usage: bash tools/tpu_recovery_loop.sh [logfile]
# (launch detached; each failed claim cycle can take ~25 min on bad days)
LOG=${1:-/tmp/tpu_recovery.log}
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
{
  attempt=0
  while true; do
    attempt=$((attempt + 1))
    echo "=== claim attempt ${attempt} $(date -u +%F' '%T) ==="
    if timeout 1800 python -u -c "import jax; print('CHIP_OK', jax.devices()[0].device_kind)"; then
      echo "=== chip up at $(date -u +%T); validate_on_tpu at $(git rev-parse --short HEAD) ==="
      timeout 5400 python -u tools/validate_on_tpu.py && echo VALIDATE_OK || echo "VALIDATE_FAIL rc=$?"
      echo "=== priming bench cache $(date -u +%T) ==="
      timeout 5400 python -u tools/prime_tpu_cache.py && echo PRIME_OK || echo "PRIME_FAIL rc=$?"
      echo "=== recovery stack done $(date -u +%T) ==="
      exit 0
    fi
    echo "--- claim failed (rc=$?) at $(date -u +%T); sleeping 60 ---"
    sleep 60
  done
} >> "$LOG" 2>&1
