#!/bin/bash
# Round-3 TPU stage 2: product ratios, o1, rc-p/table, rcbwt levels,
# final bench.py.  Strictly sequential (one TPU process at a time).
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

# 1. product payload ratios + roundtrip at the candidate geometries
run ratio_probe 7200 -- python -m turborc_tpu.bench.ratio_probe 64 \
  g64c8s8y8l32a4r4 g64c8s8y8l32a8r4 g64c8s8y8l32a16r4 \
  g32c8s8y2l32a16r16 g32c8s8y2l32a16r4

# 2. order-1 flagship (id 60) on the real corpus
run o1_real16 5400 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i rans-cdf-r1-p -r 2 --json "$OUT/o1_real16.json"

# 3. rc-p + flagship + auto table on textbwt 16MB
run table16 7200 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench turborc_tpu/bench/_data/textbwt_16777216.bin \
  -i rans-cdf-o0-p,rc-p,rans-auto -r 2 --json "$OUT/table16.json"

# 4. rcbwt end-to-end: lev 8/10 on 64MB, lev 9 (CM stage) on 16MB
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

# 5. final driver bench at the (updated) default geometry
run bench_final 5400 -- python bench.py

echo "r3 stage2 done $(date +%H:%M:%S)" | tee -a "$OUT/log"
