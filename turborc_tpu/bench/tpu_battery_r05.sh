#!/bin/bash
# Round-5 unattended TPU measurement battery.  Run with the axon tunnel
# up:  bash turborc_tpu/bench/tpu_battery_r05.sh
# Artifacts land in the repo root (committed by the round notes).
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/tpu_battery_r05.log
: > "$LOG"

run() {  # run <name> <timeout-s> -- <cmd...>
  local name=$1 tmo=$2; shift 3
  echo "=== $name $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "rc=$?" | tee -a "$LOG"
}

# 1. headline bench (packed-select decode kernel) -> stdout JSON + log
run bench_headline 5400 -- python bench.py

# 2. BWT paired table (lev 8/9/10 x 16/64MB) -> BENCH_BWT_r05.json
run bwt_table 14400 -- python -m turborc_tpu.bench.bwt_table BENCH_BWT_r05.json

# 3. shard_map-wrapped kernel roundtrip -> SHARDMAP_KERNEL_r05.json
run shardmap 3600 -- python -m turborc_tpu.bench.shardmap_kernel

# 4. weak scaling -> SCALING_r05.json (virtual 8-device CPU mesh: the
#    honest overhead_efficiency base on this 1-chip rig; JSON lines).
#    The axon site hook force-initializes its PJRT client and pins the
#    device list to the 1 real chip - strip it (same dance as
#    tests/conftest.py) so the virtual device count takes effect.
run scaling 7200 -- bash -c 'env -u PALLAS_AXON_POOL_IPS \
  JAX_PLATFORMS=cpu PYTHONPATH= \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m turborc_tpu.bench.scaling 4 8 > SCALING_r05.json'

# 5. full codec battery -> BENCH_TABLE_r05.json (longest; resumable
#    via --append)
run codec_table 43200 -- python -m turborc_tpu.bench.codec_table \
  --out BENCH_TABLE_r05.json --append

echo "battery done $(date +%H:%M:%S)" | tee -a "$LOG"
