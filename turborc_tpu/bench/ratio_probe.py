"""Product-payload ratio probe: full container-codec encode/decode round
trips (rank remap + state seeding + packed warm tables + group streams)
at a list of geometries in ONE process.

Separating ratio from speed: on the tunneled dev rig the end-to-end
product path is LINK-bound (~30 MB/s host<->device, measured; the
decoded output alone is n bytes over that link), so CLI wall-clock there
measures the tunnel, not the framework.  This probe reports the true
payload ratio and roundtrip correctness per geometry; kernel throughput
comes from geom_sweep, and the link-bound end-to-end number is recorded
once in the bench notes.

Usage: python -m turborc_tpu.bench.ratio_probe [MB] [spec ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax-turborc"))

DEFAULT_POINTS = [
    "g64c8s8y8l32a4r4",
    "g64c8s8y8l32a8r4",
    "g64c8s8y8l32a16r4",
    "g32c8s8y2l32a16r16",
    "g32c8s8y2l32a16r4",
]


def main():
    from turborc_tpu.bench import corpus
    from turborc_tpu.codecs import rans_pallas as P
    from turborc_tpu.ops.pallas.geom import Geom

    args = sys.argv[1:]
    mb = int(args.pop(0)) if args and args[0].isdigit() else 64
    specs = args or DEFAULT_POINTS
    data = corpus.get("textbwt", mb << 20)
    n = data.shape[0]
    for spec in specs:
        g = Geom.parse(spec)
        try:
            t0 = time.perf_counter()
            pay = P.encode_block(data, geom=g)
            enc_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = P.decode_block(pay, n, geom=g)
            dec_s = time.perf_counter() - t0
            r = {"geom": spec, "mb": mb, "ratio": round(len(pay) / n, 5),
                 "roundtrip_ok": bool(np.array_equal(out, data)),
                 "e2e_enc_mbs": round(n / enc_s / 1e6, 2),
                 "e2e_dec_mbs": round(n / dec_s / 1e6, 2),
                 "note": "e2e speeds include host<->device link + "
                         "host reshape (link-bound on tunneled rigs)"}
        except Exception as e:
            r = {"geom": spec, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
