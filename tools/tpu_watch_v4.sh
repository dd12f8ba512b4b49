#!/bin/bash
# Wait for the axon TPU tunnel, then run the queued experiments in order:
#  1. bench the committed config at both mesh sizes + fwd-only
#     (measures the (3, B) row-layout refactor + review fixes since the
#     last chip session, vs the recorded 4.84M fwd+bwd @ 250k),
#  2. TPU golden + stats-kernel validation (f32 SMEM counters are
#     TPU-only Mosaic code; includes the bilinear-filter path),
#  3. A/B the shadow-specific ray tile (RT_ANYHIT_RAY_TILE=256 — the
#     any-hit kernel is the biggest step cost at ~313ms),
#  4. end-to-end frame wall-clock (SSAA on/off) vs the reference's 6 s
#     headline (tools/bench_e2e.py),
#  5. A/B kernel chunk shape tc=32 n_sub=16 (finer M-T skip granularity
#     at unchanged super/DMA/pre-cull shape),
#  6. A/B ray_tile=256 (halves per-pair M-T element work; live pairs
#     grow slower than 2x on coherent tiles).
# One TPU process at a time. Results append to $LOG.
set -u
cd /root/repo
LOG=${LOG:-/tmp/ab_results.log}

echo "=== tpu_watch v4 start $(date -u +%FT%TZ) ===" >> "$LOG"
until timeout 120 python -c "import jax; assert jax.default_backend() == 'tpu'" 2>/dev/null; do
  echo "tunnel down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
echo "tunnel UP $(date -u +%FT%TZ)" >> "$LOG"

echo "--- bench dual-size+fwd $(date -u +%FT%TZ)" >> "$LOG"
timeout 5400 python bench.py >> "$LOG" 2>&1
echo "--- bench done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- tpu_validate $(date -u +%FT%TZ)" >> "$LOG"
mkdir -p /tmp/vws
(cd /tmp/vws && timeout 4000 python /root/repo/tools/tpu_validate.py) >> "$LOG" 2>&1
echo "--- tpu_validate done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- anyhit_tile256 A/B $(date -u +%FT%TZ)" >> "$LOG"
env RT_ANYHIT_RAY_TILE=256 BENCH_TRIS=250000 BENCH_REPS=3 \
  timeout 3000 python bench.py >> "$LOG" 2>&1
echo "--- anyhit_tile256 done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- e2e frame wall-clock $(date -u +%FT%TZ)" >> "$LOG"
timeout 3600 python tools/bench_e2e.py >> "$LOG" 2>&1
echo "--- e2e done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- tc32_nsub16 A/B $(date -u +%FT%TZ)" >> "$LOG"
env RT_TRI_CHUNK=32 RT_N_SUB=16 BENCH_TRIS=250000 BENCH_REPS=3 \
  timeout 3000 python bench.py >> "$LOG" 2>&1
echo "--- tc32_nsub16 done rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- ray_tile256 A/B $(date -u +%FT%TZ)" >> "$LOG"
env RT_RAY_TILE=256 BENCH_TRIS=250000 BENCH_REPS=3 \
  timeout 3000 python bench.py >> "$LOG" 2>&1
echo "--- ray_tile256 done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
echo "=== tpu_watch v4 done $(date -u +%FT%TZ) ===" >> "$LOG"
