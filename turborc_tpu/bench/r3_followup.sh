#!/bin/bash
# Round-3 follow-up TPU runs (after r3_battery.sh): ratio-point speed
# variants + the final bench.py at the chosen default geometry.
set -u
cd "$(dirname "$0")/../.."
OUT=/tmp/r3_battery
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax-turborc"

run() {
  local name=$1 tmo=$2; shift 2
  [ "$1" = "--" ] && shift
  if [ -s "$OUT/$name.json" ]; then
    echo "=== $name: cached, skipping" | tee -a "$OUT/log"; return
  fi
  echo "=== $name $(date +%H:%M:%S)" | tee -a "$OUT/log"
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json")" | tee -a "$OUT/log"
}

# ratio-point speed variants (kernel-only ranking)
run sweep3 10800 -- python -m turborc_tpu.bench.geom_sweep 64 \
  g32c8s8y2l32a16r4 g32c8s8y2l16a16r4 g32c8s4y2l32a16r16

# product run at the best tiered ratio-point candidate
run prodr_g32c8s8y2l32a16r4 5400 -- python -m turborc_tpu.cli --lanes 4096 \
  --block-size 67108864 --geom g32c8s8y2l32a16r4 bench \
  turborc_tpu/bench/_data/textbwt_67108864.bin -i rans-cdf-o0-p -r 2 \
  --json "$OUT/prodr_g32c8s8y2l32a16r4.json"

echo "r3 followup done $(date +%H:%M:%S)" | tee -a "$OUT/log"
