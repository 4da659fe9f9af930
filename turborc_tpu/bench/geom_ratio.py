"""Flagship XLA-twin container-ratio probe over geometry specs.

The twin shares the kernel's exact model trajectory, so these ratios ARE
the kernel codec's container ratios - measurable on any CPU host.

Run: python -m turborc_tpu.bench.geom_ratio <mb> <spec> [<spec>...]
(evidence: bench_artifacts/r05/ratio_grid.json)
"""
import sys
import time

import numpy as np
from turborc_tpu.bench import corpus
from turborc_tpu.ops.pallas.geom import Geom
from turborc_tpu.codecs import rans_pallas as RP

mb = int(sys.argv[1]); specs = sys.argv[2:]
n = mb << 20
data = corpus.get("textbwt", n)
for spec in specs:
    g = Geom.parse(spec)
    t0 = time.time()
    pay = RP.encode_block(data, use_pallas_encoder=False, geom=g)
    print(f"mb={mb} {spec} len={len(pay)} ratio={len(pay)/n:.5f} t={time.time()-t0:.0f}s", flush=True)
