"""Decode-kernel time attribution via the TRC_ABLATE knob.

Runs decode_tile on pre-staged device streams at TRC_GEOM once per
ablation set (fresh subprocess each - ABLATE is an import-time
constant), reporting MB/s per configuration.  Output is WRONG with any
part ablated; only the timing is meaningful.

Usage: python -m turborc_tpu.bench.ablate [MB] [out.json]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax-turborc"))
import jax.numpy as jnp
from turborc_tpu.bench import corpus
from turborc_tpu.codecs import blockio as bio
from turborc_tpu.codecs import rans_pallas as P
from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import Geom

mb = int(sys.argv[1])
g = Geom.parse(os.environ.get("TRC_GEOM", "g64c8s8y8l32a4r4"))
n = mb << 20
data = corpus.get("textbwt", n)
K = P._K_for(n, g)
reps = 3
streams, his, los = [], [], []
dec = K_.decode_tile_x2 if g.nstates == 2 else K_.decode_tile
for i in range(reps + 1):
    d = ((data.astype(np.int32) + i) % 256).astype(np.uint8)
    block, padded = P._shape_lanes(d, K, g)
    _, (hq, lq) = bio.quantize_tables(*P._group_tables(padded, g))
    hi_tbl, lo_tbl = P._cum_args(hq, lq)
    gs, gl = K_.encode_tile_pallas(jnp.asarray(block), K, hi_tbl, lo_tbl,
                                   geom=g)
    _ = np.asarray(gl)
    streams.append(gs); his.append(hi_tbl); los.append(lo_tbl)
out, _fs = dec(streams[0], K, his[0], los[0], geom=g)
_ = np.asarray(out[0, 0, :4])
t0 = time.perf_counter()
outs = [dec(streams[i], K, his[i], los[i], geom=g)
        for i in range(1, reps + 1)]
_ = [np.asarray(o[0][0, 0, :4]) for o in outs]
dt = (time.perf_counter() - t0) / reps
print(json.dumps({"ablate": os.environ.get("TRC_ABLATE", ""),
                  "geom": g.spec, "dec_mbs": round(n / dt / 1e6, 2)}))
"""

SETS = ["", "fetch", "sync", "losync", "sync,losync", "wb", "rowsel",
        "fetch,sync,losync,wb,rowsel"]


def main(mb: int = 64, out_path: str | None = None):
    rows = []
    for s in SETS:
        env = dict(os.environ, TRC_ABLATE=s)
        r = subprocess.run([sys.executable, "-c", _CHILD, str(mb)],
                           env=env, capture_output=True, text=True)
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            rows.append({"ablate": s, "error": r.stderr[-400:]})
        print(json.dumps(rows[-1]), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, a[1] if len(a) > 1 else None)
