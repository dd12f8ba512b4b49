#!/bin/bash
# Round-4 tail watcher: wait for the axon TPU tunnel to come back,
# then run the full on-chip validation + both bench lanes once and
# log everything. Safe to re-run; one TPU process at a time.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_r4.log}

echo "=== tpu_watch r4 start $(date -u +%FT%TZ) ===" >> "$LOG"

# Probe until the tunnel answers (device list returns within 90 s).
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "--- tunnel up $(date -u +%FT%TZ)" >> "$LOG"
    break
  fi
  echo "--- tunnel down, retrying $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done

echo "--- tpu_validate $(date -u +%FT%TZ)" >> "$LOG"
timeout 3600 python tools/tpu_validate.py >> "$LOG" 2>&1
echo "--- tpu_validate rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "--- bench (default lanes) $(date -u +%FT%TZ)" >> "$LOG"
timeout 4200 python bench.py >> "$LOG" 2>&1
echo "--- bench rc=$? $(date -u +%FT%TZ)" >> "$LOG"

echo "=== tpu_watch r4 done $(date -u +%FT%TZ) ===" >> "$LOG"
