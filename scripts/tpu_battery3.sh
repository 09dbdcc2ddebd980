#!/bin/bash
# Round-4 TPU battery: GNT ray-fold e2e, attack-gather crossover (V=4 vs 10,
# SPG vs per-tap), and the full default bench (roofline + secondary gnt).
# One chip; serialize with any other relay job.
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  local log=/tmp/battery3_${name}.log
  echo "=== $name -> $log"
  timeout -k 60 6000 "$@" >"$log" 2>&1
  local rc=$?
  echo "exit=$rc tail:"
  tail -5 "$log" | sed 's/^/    /'
  if [ $rc -eq 124 ] || [ $rc -eq 137 ]; then
    echo "    (timed out; sleeping 300s for relay self-recovery)"
    sleep 300
  fi
}

# 1. GNT-full render, ray-fold ON (the new default) vs OFF — the round-4
# headline comparison (verdict item 1: >=15k rays/s target)
run gnt_rayfold env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    BENCH_RENDER_ONLY=1 BENCH_SECONDARY=0 python bench.py
run gnt_norayfold env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    BENCH_RENDER_ONLY=1 BENCH_SECONDARY=0 BENCH_GNT_RAYFOLD=1 python bench.py

# 2. attack-gather crossover: per-tap vs SPG at V=4 (flagship) and V=10 —
# justifies --attack_spg_min_views (verdict item 8)
run atk_v4_tap  env BENCH_ATTACK_SRC=4  BENCH_SECONDARY=0 python bench.py
run atk_v4_spg  env BENCH_ATTACK_SRC=4  BENCH_ATTACK_SPG=1 BENCH_SECONDARY=0 python bench.py
run atk_v10_tap env BENCH_ATTACK_SRC=10 BENCH_SECONDARY=0 python bench.py
run atk_v10_spg env BENCH_ATTACK_SRC=10 BENCH_ATTACK_SPG=1 BENCH_SECONDARY=0 python bench.py

# 3. the full default driver artifact shape: ibrnet + roofline + secondary gnt
run full_default python bench.py

echo "=== summary"
grep -h "rays/s\|ms/iter\|roofline" /tmp/battery3_*.log | sed 's/^/  /'
