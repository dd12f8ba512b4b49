#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the kernel-shape
# A/B benches (ROADMAP item 4) sequentially: baseline x2 (variance),
# tc=32/n_sub=16, ray_tile=256. One TPU process at a time (tunnel
# serializes anyway). Results append to $LOG as labelled JSON lines.
set -u
cd /root/repo
LOG=${LOG:-/tmp/ab_results.log}

echo "=== tpu_watch_ab start $(date -u +%FT%TZ) ===" >> "$LOG"
until timeout 120 python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; do
  echo "tunnel down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
echo "tunnel UP $(date -u +%FT%TZ)" >> "$LOG"

run() {
  local label=$1; shift
  echo "--- $label $(date -u +%FT%TZ)" >> "$LOG"
  env "$@" BENCH_TRIS=250000 BENCH_REPS=3 timeout 3000 python bench.py >> "$LOG" 2>&1
  echo "--- $label done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
}

run baseline1
run baseline2
run tc32_sub16 RT_TRI_CHUNK=32 RT_N_SUB=16
run raytile256 RT_RAY_TILE=256
echo "=== tpu_watch_ab done $(date -u +%FT%TZ) ===" >> "$LOG"
