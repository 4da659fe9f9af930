#!/bin/bash
# Round-3 TPU measurement battery.  Stages are strictly sequential: the
# device tunnel admits ONE process at a time.  Results land in
# /tmp/r3_battery/ as JSON.  Kernel compiles reuse the persistent cache.
set -u
cd "$(dirname "$0")/../.."
OUT=/tmp/r3_battery
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax-turborc"

run() {  # run <name> <timeout-s> -- <cmd...>
  local name=$1 tmo=$2; shift 2
  [ "$1" = "--" ] && shift
  if [ -s "$OUT/$name.json" ]; then
    echo "=== $name: cached, skipping" | tee -a "$OUT/log"; return
  fi
  echo "=== $name $(date +%H:%M:%S)" | tee -a "$OUT/log"
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json")" | tee -a "$OUT/log"
}

# ---- stage 1: second kernel geometry sweep (speed frontier refinement
# around the round-1 winners + the ratio-point geometries)
run sweep2 10800 -- python -m turborc_tpu.bench.geom_sweep 64 \
  g64c8s8y8l32a8r4 g64c8s8y8l64a8r4 g64c16s8y16l32a4r4 \
  g64c16s8y16l64a8r4 g32c8s8y2l32a16r16 g32c8s8y4l32a16r4

# ---- stage 2: product-path (API/CLI/container) runs at the candidate
# geometries on 64MB: true ratio (rank remap + state seeding + tables)
# AND end-to-end speed in one measurement.
for spec in g64c8s8y8l32a4r4 g64c8s8y8l32a8r4; do
  run "prod_$spec" 5400 -- python -m turborc_tpu.cli --lanes 8192 \
    --block-size 67108864 --geom "$spec" bench \
    turborc_tpu/bench/_data/textbwt_67108864.bin -i rans-cdf-o0-p -r 2 \
    --json "$OUT/prod_$spec.json"
done
# ratio-point candidate (target: ratio <= 0.2732 at >= 300 MB/s)
for spec in g32c8s8y2l32a16r16; do
  run "prodr_$spec" 5400 -- python -m turborc_tpu.cli --lanes 4096 \
    --block-size 67108864 --geom "$spec" bench \
    turborc_tpu/bench/_data/textbwt_67108864.bin -i rans-cdf-o0-p -r 2 \
    --json "$OUT/prodr_$spec.json"
done

# ---- stage 3: order-1 flagship (id 60) ratio + speed on the real corpus
run o1_real16 5400 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i rans-cdf-r1-p -r 2 --json "$OUT/o1_real16.json"

# ---- stage 4: bit-tree kernel (id 8) + flagship table on textbwt 16MB
run table16 7200 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench turborc_tpu/bench/_data/textbwt_16777216.bin \
  -i rans-cdf-o0-p,rc-p,rans-auto -r 2 --json "$OUT/table16.json"

# ---- stage 5: rcbwt end-to-end on 64MB text, levels 8/10 (paired with
# the same-machine reference -e20 -l8/-l9 rows); lev 9 (rcmrr CM stage)
# on the 16MB prefix - the CM scan codec is the known-slow family.
for lev in 8 10 9; do
  mb=64; [ "$lev" = 9 ] && mb=16
  run "bwt_l$lev" 10800 -- python - <<EOF
import json, time
import numpy as np
from turborc_tpu.codecs import bwt
n = $mb << 20
data = np.fromfile("turborc_tpu/bench/_data/text_67108864.bin",
                   np.uint8)[:n]
t0 = time.perf_counter(); pay = bwt.encode_block(data, level=$lev)
enc_s = time.perf_counter() - t0
t0 = time.perf_counter(); out = bwt.decode_block(pay, n, level=$lev)
dec_s = time.perf_counter() - t0
print(json.dumps({"codec": "rcbwt", "lev": $lev, "mb": $mb,
                  "ratio": round(len(pay)/n, 5),
                  "enc_mbs": round(n/enc_s/1e6, 2),
                  "dec_mbs": round(n/dec_s/1e6, 2),
                  "roundtrip_ok": bool(np.array_equal(out, data))}))
EOF
done

echo "r3 battery done $(date +%H:%M:%S)" | tee -a "$OUT/log"
