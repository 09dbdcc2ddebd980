#!/bin/bash
# One-shot TPU measurement battery for round-2 open items. Run when the
# relay tunnel is up; logs to /tmp/battery_*.log and prints a summary.
# Serializes jobs (one chip) and never kills mid-compile (wedges the relay).
set -u
cd "$(dirname "$0")/.."

run() {  # name, env..., -- cmd...
  local name=$1; shift
  local log=/tmp/battery_${name}.log
  echo "=== $name -> $log"
  # 100-min ceiling per job: generous enough that a kill should never land
  # mid-compile (worst measured fresh-graph compile ~25 min), but bounds an
  # unattended run against a half-up relay hanging the whole battery. A kill
  # can still wedge the relay for ~5-10 min (self-recovers); pause 5 min
  # before the next job when a timeout fires.
  timeout -k 60 6000 "$@" >"$log" 2>&1
  local rc=$?
  echo "exit=$rc tail:"
  tail -4 "$log" | sed 's/^/    /'
  if [ $rc -eq 124 ] || [ $rc -eq 137 ]; then
    echo "    (timed out; sleeping 300s for relay self-recovery)"
    sleep 300
  fi
}

# 1. flagship IBRNet: confirm windowed-BSPG render + V=4 attack + breakdown
run ibrnet env BENCH_BREAKDOWN=1 python bench.py

# 2. GNT-full with aggregator fusions + BSPG
run gnt env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    python bench.py

# 3. bf16 feature-net attack step (opt-in lever measurement, V=4)
run ibrnet_bf16feat env BENCH_FEATURE_DTYPE=bfloat16 BENCH_ATTACK_ITERS=10 \
    python bench.py

# 3b. attack step with the per-ray segment-patch gather (SPG)
run ibrnet_spg env BENCH_ATTACK_SPG=1 BENCH_ATTACK_ITERS=10 python bench.py

# 2b. GNT-full with sample folding (view-side lane packing)
run gnt_fold env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    BENCH_GNT_FOLD=2 python bench.py

# 1b. flagship IBRNet with sample folding
run ibrnet_fold env BENCH_IBR_FOLD=2 BENCH_ATTACK_ITERS=10 python bench.py

# 1c. flagship IBRNet with 16x16 BSPG blocks (half the patch chains per
# view; selection work per block grows — measure which side wins)
run ibrnet_blk16 env BENCH_BSPG_BLOCK=16 BENCH_ATTACK_ITERS=10 python bench.py

# 2c. GNT-full with 16x16 BSPG blocks
run gnt_blk16 env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    BENCH_BSPG_BLOCK=16 python bench.py

# 4. dim-8 layout hypothesis micro-probe (GNT attention chain)
run dim8 python scripts/probe_dim8.py

# 4b. sample-fold micro-probe (folded vs unfolded view-attention chain)
run sfold python scripts/probe_sfold.py

# 5. GNT op profile (top self-time ops of the render chunk)
run gnt_profile env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 BENCH_NIMPORTANCE=0 \
    python scripts/profile_render.py /tmp/gnt_trace

echo "=== summary"
grep -h "rays/s\|ms/iter\|breakdown\|narrow\|wide\|smajor" /tmp/battery_*.log \
  | sed 's/^/  /'
