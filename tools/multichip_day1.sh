#!/usr/bin/env bash
# Multi-chip day-1 playbook (VERDICT r4 next-step 6): the moment real
# multi-chip hardware appears, ONE command produces the BASELINE.json
# north-star measurement set —
#   1. golden validation incl. the sharded lanes (tools/tpu_validate.py)
#   2. scaling efficiency 1..N devices (tools/bench_scaling.py)
#   3. overlap-vs-bulk psum schedule A/B (tools/bench_overlap_ab.py)
#   4. geometry-sharded throughput (tools/bench_geoshard.py)
# and aggregates everything into ONE JSON (default MULTICHIP_DAY1.json).
#
# Usage:
#   tools/multichip_day1.sh [out.json]
# Smoke test on the virtual 8-device CPU mesh (plumbing only, small
# shapes, skips the TPU-only golden validation):
#   DAY1_SMOKE=1 tools/multichip_day1.sh /tmp/day1_smoke.json
#
# Run ONE TPU process at a time (this script already serializes its
# lanes); concurrent tunnel users distort every timing.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-MULTICHIP_DAY1.json}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

if [ "${DAY1_SMOKE:-0}" = "1" ]; then
  # NOTE: the JAX_PLATFORMS env var does NOT keep the axon
  # plugin off the tunnel; the tools switch in-script.
  export RT_FORCE_CPU=1
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
  # Tiny shapes: the smoke run checks plumbing end-to-end, not perf.
  export SCALE_WIDTH=192 SCALE_HEIGHT=96 SCALE_TRIS=500 SCALE_REPS=1
  export AB_WIDTH=128 AB_HEIGHT=64 AB_TRIS=300 AB_REPS=1
  export GEO_WIDTH=96 GEO_HEIGHT=48 GEO_TRIS=300 GEO_REPS=1
fi

run_lane () { # name, command...
  local name="$1"; shift
  echo "== day1 lane: $name ==" >&2
  if "$@" > "$WORK/$name.out" 2> "$WORK/$name.err"; then
    echo ok > "$WORK/$name.status"
  else
    echo "fail($?)" > "$WORK/$name.status"
    tail -5 "$WORK/$name.err" >&2
  fi
}

if [ "${DAY1_SMOKE:-0}" != "1" ]; then
  run_lane validate python tools/tpu_validate.py
fi
run_lane scaling python tools/bench_scaling.py
run_lane overlap_ab python tools/bench_overlap_ab.py
run_lane geoshard python tools/bench_geoshard.py

python - "$WORK" "$OUT" <<'EOF'
import json, os, sys
work, out = sys.argv[1], sys.argv[2]
result = {}
for name in ("validate", "scaling", "overlap_ab", "geoshard"):
    sp = os.path.join(work, name + ".status")
    if not os.path.exists(sp):
        result[name] = {"status": "skipped"}
        continue
    status = open(sp).read().strip()
    entry = {"status": status}
    body = open(os.path.join(work, name + ".out")).read()
    if name == "validate":
        entry["all_ok"] = "ALL OK" in body
        entry["tail"] = body.strip().splitlines()[-8:]
    else:
        # Each bench prints ONE JSON line (possibly after warnings).
        for line in body.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    entry["result"] = json.loads(line)
                except ValueError:
                    pass
    result[name] = entry
ok = all(v.get("status") == "ok" for v in result.values()
         if v.get("status") != "skipped")
result["summary"] = {"all_lanes_ok": ok}
with open(out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({"day1": out, "all_lanes_ok": ok}))
EOF
