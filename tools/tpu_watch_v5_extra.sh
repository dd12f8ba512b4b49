#!/bin/bash
# Runs AFTER tpu_watch_v4.sh finishes (watches its log for the done
# marker): extra on-chip experiments that shouldn't preempt the v4
# queue. One TPU process at a time.
set -u
cd /root/repo
LOG=${LOG:-/tmp/ab_results.log}

until grep -q "=== tpu_watch v4 done" "$LOG" 2>/dev/null; do
  sleep 120
done

echo "=== tpu_watch v5-extra start $(date -u +%FT%TZ) ===" >> "$LOG"
echo "--- bench 1M tris $(date -u +%FT%TZ)" >> "$LOG"
env BENCH_TRIS=1000000 BENCH_REPS=3 timeout 4200 python bench.py >> "$LOG" 2>&1
echo "--- bench 1M done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
echo "=== tpu_watch v5-extra done $(date -u +%FT%TZ) ===" >> "$LOG"
