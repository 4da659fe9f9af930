"""CDF adaptation-rate ratio probe on BWT text (lev-8/9 ratio hunt).

The staircase update rate (cdf_.h CDFRATE=7) trades adaptation speed
against estimator noise; BWT output is locally homogeneous (runs, short
context segments), which rewards faster adaptation.  This probe runs the
flagship's XLA twin (rans_cdf_s8, same share-span model trajectory) over
TRC_CDFRATE values in a subprocess each and reports encode sizes.

Run: python -m turborc_tpu.bench.rate_probe [mb] [rates...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import sys
import numpy as np
from turborc_tpu.bench import corpus
from turborc_tpu.codecs import rans_cdf_s8
mb = int(sys.argv[1])
n = mb << 20
data = corpus.get("textbwt", n)
pay = rans_cdf_s8.encode_block(data, lanes=8192, step_quant=64)
print("RESULT", len(pay), len(pay) / n)
"""


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rates = [int(r) for r in sys.argv[2:]] or [5, 6, 7]
    rows = []
    for rate in rates:
        env = dict(os.environ, TRC_CDFRATE=str(rate), JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", _CHILD, str(mb)],
                           env=env, capture_output=True, text=True,
                           timeout=7200)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line is None:
            print(rate, "FAILED", r.stderr[-300:])
            continue
        _, size, ratio = line.split()
        rows.append({"rate": rate, "size": int(size),
                     "ratio": round(float(ratio), 5)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"mb": mb, "rows": rows}))


if __name__ == "__main__":
    main()
