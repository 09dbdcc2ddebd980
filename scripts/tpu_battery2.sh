#!/bin/bash
# Follow-up TPU battery (round 2): scan-path recheck with the median-of-3
# fix, winner combinations, and an IBRNet render op profile. Run AFTER
# scripts/tpu_battery.sh finishes (one chip; serialize).
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  local log=/tmp/battery2_${name}.log
  echo "=== $name -> $log"
  timeout -k 60 6000 "$@" >"$log" 2>&1
  local rc=$?
  echo "exit=$rc tail:"
  tail -4 "$log" | sed 's/^/    /'
  if [ $rc -eq 124 ] || [ $rc -eq 137 ]; then
    echo "    (timed out; sleeping 300s for relay self-recovery)"
    sleep 300
  fi
}

# 1. flagship recheck: median-of-3 scan timing (was a single-sample 6x
# outlier in battery 1) -> decides the engine's scan-vs-dispatch default
run ibrnet_recheck python bench.py

# 2. attack winner combo: bf16 feature net + per-ray SPG gather
run ibrnet_bf16_spg env BENCH_FEATURE_DTYPE=bfloat16 BENCH_ATTACK_SPG=1 \
    python bench.py

# 3. IBRNet render op profile (top self-time ops at the 26k rays/s config)
run ibrnet_profile python scripts/profile_render.py /tmp/ibrnet_trace

echo "=== summary"
grep -h "rays/s\|ms/iter" /tmp/battery2_*.log | sed 's/^/  /'
