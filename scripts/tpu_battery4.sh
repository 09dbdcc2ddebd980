#!/bin/bash
# Round-4 TPU measurement battery: fused GNT attention kernels (ra shipped,
# vt v1 + lane-packed v2 experimental) — micro, aggregator-level, and e2e —
# plus the two headline bench runs. Run when the relay is up (chain behind
# scripts/relay_watch.sh); logs to /tmp/battery4_*.log.
set -u
cd "$(dirname "$0")/.."

run() {  # name, cmd...
  local name=$1; shift
  local log=/tmp/battery4_${name}.log
  echo "=== $name -> $log ($(date +%H:%M:%S))"
  timeout -k 60 6000 "$@" >"$log" 2>&1
  local rc=$?
  echo "exit=$rc tail:"
  tail -6 "$log" | sed 's/^/    /'
  if [ $rc -eq 124 ] || [ $rc -eq 137 ]; then
    echo "    (timed out; sleeping 300s for relay self-recovery)"
    sleep 300
  fi
}

# 1. which kernel wins where: vt v1 / vt lane-packed / ra vs their XLA modules
run micro python scripts/probe_kernel_micro.py

# 2. full aggregator (depth-8, one jit): ra-only fused (the shipped config)
run agg_ra python scripts/probe_fused_agg.py

# 2b. + vt v1
run agg_vt env PROBE_FUSED_VT=1 python scripts/probe_fused_agg.py

# 2c. + vt lane-packed
run agg_vtlp env PROBE_FUSED_VT=1 NERFOOL_VT_LANEPACK=1 \
    python scripts/probe_fused_agg.py

# 3. e2e whole-frame GNT render A/B: fused_attn(ra) on/off
run e2e_ra python scripts/probe_vtfused.py

# 3b. e2e with vt lane-packed too
run e2e_vtlp env PROBE_FUSED_VT=1 NERFOOL_VT_LANEPACK=1 \
    python scripts/probe_vtfused.py

# 4. headline benches (driver-format JSON): gnt secondary runs inside ibrnet
run bench_ibrnet python bench.py
run bench_gnt env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 \
    BENCH_NIMPORTANCE=0 BENCH_SECONDARY=none python bench.py

# 5. GNT attack step with the fused ray-attention custom VJP vs plain
run bench_gnt_atkfused env BENCH_BACKBONE=gnt BENCH_NSAMPLES=192 \
    BENCH_NIMPORTANCE=0 BENCH_SECONDARY=none BENCH_GNT_FUSED_ATTACK=1 \
    BENCH_ATTACK_ITERS=10 python bench.py

echo "battery4 done $(date +%H:%M:%S)"
