#!/bin/bash
# Round-3 TPU stage 3: r2-tiering speed variant + final ratio probes at
# the settled code version.
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

run sweep4 10800 -- python -m turborc_tpu.bench.geom_sweep 64 \
  g64c8s8y8l32a4r2 g64c8s8y8l64a4r2

# final-code product ratios: headline + r2 variant + ratio point
run ratio_probe2 7200 -- python -m turborc_tpu.bench.ratio_probe 64 \
  g64c8s8y8l32a4r4 g64c8s8y8l32a4r2 g32c8s8y2l32a16r4

# o1 at 32/16 groups: the r1 warm tables cost 0.56% of payload at g64
# (measured host-side), 0.27%/0.13% at g32/g16; longer spans also
# amortize the ramp better.
run o1_real16_g32 5400 -- python -m turborc_tpu.cli --lanes 4096 \
  --block-size 16777216 --geom g32c8s8y4l32a16r4 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i rans-cdf-r1-p -r 1 --json "$OUT/o1_real16_g32_cli.json"
run o1_real16_g16 5400 -- python -m turborc_tpu.cli --lanes 2048 \
  --block-size 16777216 --geom g16c8s8y4l32a16r4 bench \
  turborc_tpu/bench/_data/realsrcbwt_16777216.bin \
  -i rans-cdf-r1-p -r 1 --json "$OUT/o1_real16_g16_cli.json"

# rcbwt lev 8 at 16MB (64MB qlfc stage exceeds HBM - the entropy stage
# needs internal segmentation, round-4 item; ref 16MB rows exist)
run bwt_l8_16 10800 -- python - <<'EOF'
import json, time
import numpy as np
from turborc_tpu.codecs import bwt
n = 16 << 20
data = np.fromfile("turborc_tpu/bench/_data/text_67108864.bin",
                   np.uint8)[:n]
t0 = time.perf_counter(); pay = bwt.encode_block(data, level=8)
enc_s = time.perf_counter() - t0
t0 = time.perf_counter(); out = bwt.decode_block(pay, n, level=8)
dec_s = time.perf_counter() - t0
print(json.dumps({"codec": "rcbwt", "lev": 8, "mb": 16,
                  "ratio": round(len(pay)/n, 5),
                  "enc_mbs": round(n/enc_s/1e6, 2),
                  "dec_mbs": round(n/dec_s/1e6, 2),
                  "roundtrip_ok": bool(np.array_equal(out, data))}))
EOF

# rc-p (id 8) kernel-only throughput on textbwt 16MB (VERDICT item 7:
# the product row is link-bound on this rig; kernel speed is the claim)
run rcp_kernel16 5400 -- python - <<'EOF'
import json, time
import numpy as np
import jax.numpy as jnp
from turborc_tpu.bench import corpus
from turborc_tpu.codecs import rc_tree as T
from turborc_tpu.ops.pallas import bittree_kernel as B_
from turborc_tpu.ops.pallas.geom import DEFAULT as g

reps = 2
n = 16 << 20
data = corpus.get("textbwt", n)
blocks, trees = [], []
for i in range(reps + 1):
    d = ((data.astype(np.int32) + i) % 256).astype(np.uint8)
    span = d[T._P._seed_bytes(g):]
    K = T._K_for(span.shape[0], g)
    blocks.append(jnp.asarray(T._shape_lanes(span, K, g)))
    trees.append(jnp.asarray(B_.warm_tree(span)))
_ = [np.asarray(b[0, :4]) for b in blocks]
gs0, gl0 = B_.encode_tile_pallas(blocks[0], K, trees[0], geom=g)
_ = np.asarray(gl0)
t0 = time.perf_counter()
outs = [B_.encode_tile_pallas(blocks[i], K, trees[i], geom=g)
        for i in range(1, reps + 1)]
_ = [np.asarray(o[1]) for o in outs]
enc_s = (time.perf_counter() - t0) / reps
streams = [gs0] + [o[0] for o in outs]
out, _fs = B_.decode_tile(streams[0], K, trees[0], geom=g)
_ = np.asarray(out[0, 0, :4])
t0 = time.perf_counter()
decs = [B_.decode_tile(streams[i], K, trees[i], geom=g)
        for i in range(1, reps + 1)]
_ = [np.asarray(d[0][0, 0, :4]) for d in decs]
dec_s = (time.perf_counter() - t0) / reps
ok = bool(np.array_equal(np.asarray(out).reshape(K, g.lanes).T,
                         np.asarray(blocks[0])))
print(json.dumps({"codec": "rc-p kernel", "mb": 16, "geom": g.spec,
                  "enc_mbs": round(n / enc_s / 1e6, 1),
                  "dec_mbs": round(n / dec_s / 1e6, 1),
                  "roundtrip_ok": ok}))
EOF

echo "r3 stage3 done $(date +%H:%M:%S)" | tee -a "$OUT/log"
