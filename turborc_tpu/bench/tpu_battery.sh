#!/bin/bash
# Unattended TPU measurement battery for the round's kernel changes.
# Run when the axon tunnel is up:  bash turborc_tpu/bench/tpu_battery.sh
# Results accumulate in /tmp/tpu_battery/ as JSON lines.
set -u
cd "$(dirname "$0")/../.."
OUT=/tmp/tpu_battery
mkdir -p "$OUT"

run() {  # run <name> <timeout-s> <env...> -- <cmd...>
  local name=$1 tmo=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name (${envs[*]:-default})" | tee -a "$OUT/log"
  env "${envs[@]}" timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? $(tail -c 400 "$OUT/$name.json")" | tee -a "$OUT/log"
}

# 1. flagship driver bench at the shipped default geometry
run bench_default 3600 -- python bench.py

# 2. kernel-only latency: shipped default, ratio point, speed points
run lat_g64_s4_l32 3600 TRC_GROUPS=64 TRC_SYNC=4 TRC_LSYNC=32 \
  -- python -m turborc_tpu.bench.kernel_lat 64
run lat_g32_s2_l32 3600 TRC_GROUPS=32 TRC_SYNC=2 TRC_LSYNC=32 \
  -- python -m turborc_tpu.bench.kernel_lat 64
run lat_g64_s8_l32 3600 TRC_GROUPS=64 TRC_SYNC=8 TRC_LSYNC=32 \
  -- python -m turborc_tpu.bench.kernel_lat 64
run lat_g64_s4_l64 3600 TRC_GROUPS=64 TRC_SYNC=4 TRC_LSYNC=64 \
  -- python -m turborc_tpu.bench.kernel_lat 64
run lat_g128_s4_l32 3600 TRC_GROUPS=128 TRC_SYNC=4 TRC_LSYNC=32 \
  -- python -m turborc_tpu.bench.kernel_lat 64
# tiering-off baseline (LSYNC=CHUNK=8: cold rows at grid-step cadence)
run lat_g64_s4_l8 3600 TRC_GROUPS=64 TRC_SYNC=4 TRC_LSYNC=8 \
  -- python -m turborc_tpu.bench.kernel_lat 64

# 2b. order-1 kernels (no sync butterflies; contiguous spans)
run lat_o1_g64 3600 TRC_GROUPS=64 \
  -- python -m turborc_tpu.bench.kernel_lat 64 o1
run lat_o1_g32 3600 TRC_GROUPS=32 \
  -- python -m turborc_tpu.bench.kernel_lat 64 o1
# order-1 end-to-end ratio+throughput on the real corpus (codec id 60)
run o1_real16 5400 -- python - <<'EOF'
import json, time
import numpy as np
from turborc_tpu.codecs import rans_pallas_r1 as P1
n = 16 << 20
data = np.fromfile("turborc_tpu/bench/_data/realsrcbwt_16777216.bin",
                   np.uint8)[:n]
pay = P1.encode_block(data)
out = P1.decode_block(pay, n)
ok = bool(np.array_equal(out, data))
reps = 2
variants = [np.roll(data, 1 + 7 * i) for i in range(1, reps + 1)]
t0 = time.perf_counter()
pays = [P1.encode_block(v) for v in variants]
enc_s = (time.perf_counter() - t0) / reps
t0 = time.perf_counter()
for p in pays:
    P1.decode_block(p, n)
dec_s = (time.perf_counter() - t0) / reps
print(json.dumps({"codec": "rans-cdf-r1-p", "mb": 16,
                  "ratio": len(pay) / n,
                  "enc_mbs": round(n / enc_s / 1e6, 1),
                  "dec_mbs": round(n / dec_s / 1e6, 1),
                  "roundtrip_ok": ok}))
EOF

# 3. rc-p bit-tree kernel throughput + ratio on the bench corpus
run rc_tree_lat 3600 -- python - <<'EOF'
import json, time
import numpy as np
from turborc_tpu.bench import corpus
from turborc_tpu.codecs import rc_tree
n = 64 << 20
data = corpus.get("textbwt", n)
pay = rc_tree.encode_block(data)          # warm compile (enc+packing)
out = rc_tree.decode_block(pay, n)
ok = bool(np.array_equal(out, data))
reps = 3
variants = [((data.astype(np.int32) + i) % 256).astype(np.uint8)
            for i in range(1, reps + 1)]
t0 = time.perf_counter()
pays = [rc_tree.encode_block(v) for v in variants]
enc_s = (time.perf_counter() - t0) / reps
t0 = time.perf_counter()
for p in pays:
    rc_tree.decode_block(p, n)
dec_s = (time.perf_counter() - t0) / reps
print(json.dumps({"codec": "rc-p", "mb": 64, "ratio": len(pay) / n,
                  "enc_mbs": round(n / enc_s / 1e6, 1),
                  "dec_mbs": round(n / dec_s / 1e6, 1),
                  "roundtrip_ok": ok}))
EOF

# 4. container/CLI end-to-end on 16MB (device-link compaction effect)
python - <<'EOF'
import numpy as np
from turborc_tpu.bench import corpus
corpus.get("textbwt", 16 << 20).tofile("/tmp/textbwt16.bin")
EOF
run cli_table16 5400 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench /tmp/textbwt16.bin \
  -i rans-cdf-s8,rans-cdf-o0-p,rc-p -r 2 --json "$OUT/cli_table16.json"

# 5. real corpus: kernel codecs, then the level-parallel bec family
# (bec wants long lanes: 64 x 256K symbols)
run cli_real16 5400 -- python -m turborc_tpu.cli --lanes 8192 \
  --block-size 16777216 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i rans-cdf-o0-p,rc-p -r 2 --json "$OUT/cli_real16.json"
run cli_real16_bec 5400 -- python -m turborc_tpu.cli --lanes 64 \
  --block-size 16777216 --step-quant 1024 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i bec,bec-w -r 2 --json "$OUT/cli_real16_bec.json"

echo "battery done" | tee -a "$OUT/log"
