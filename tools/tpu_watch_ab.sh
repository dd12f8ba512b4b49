#!/bin/bash
# Wait for the axon TPU tunnel to come back, then (1) re-bench the
# committed config at both mesh sizes (measures the (3, B) row-layout
# refactor, which landed after the last chip session), (2) run the
# TPU golden + stats-kernel validation. The tc=32/n_sub=16 and
# ray_tile=256 kernel-shape experiments already ran on-chip earlier
# (tc32 4.17M, rt256 3.52M vs committed 4.84M rays/s — both lose;
# /tmp/vws/bench_*.out), so they are not repeated. One TPU process at
# a time. Results append to $LOG.
set -u
cd /root/repo
LOG=${LOG:-/tmp/ab_results.log}

echo "=== tpu_watch v2 start $(date -u +%FT%TZ) ===" >> "$LOG"
until timeout 120 python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; do
  echo "tunnel down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
echo "tunnel UP $(date -u +%FT%TZ)" >> "$LOG"

echo "--- bench dual-size $(date -u +%FT%TZ)" >> "$LOG"
timeout 4000 python bench.py >> "$LOG" 2>&1
echo "--- bench done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- tpu_validate $(date -u +%FT%TZ)" >> "$LOG"
(cd /tmp/vws && timeout 4000 python /root/repo/tools/tpu_validate.py) >> "$LOG" 2>&1
echo "--- tpu_validate done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
echo "=== tpu_watch v2 done $(date -u +%FT%TZ) ===" >> "$LOG"
