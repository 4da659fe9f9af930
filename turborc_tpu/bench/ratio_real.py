"""Same-bytes ratio comparison on the REAL-text BWT corpus.

Round-1 review weak #8: all ratio statements were made on the synthetic
Markov corpus only.  This harness encodes the real-source BWT corpus
(bench/corpus.py `realsrcbwt`, committed) with the repo codecs and pairs
each with the reference binary's ratio on the identical bytes
(bench/_baseline/ref_realsrcbwt16.json).

Ratio-only: runs on any backend (CPU included - sizes are
backend-independent); speed claims stay with the TPU harnesses.

Usage:
    python -m turborc_tpu.bench.ratio_real [n_mb] [codec,codec,...]
"""
from __future__ import annotations

import json
import sys

import numpy as np

# codec -> (reference id on the same bytes, lanes override)
PAIRS = {
    "rans-cdf-s8": (56, 8192),
    "rans-cdf-o0": (46, 512),
    "rans-cdf-o1": (64, 128),
    "rans-cdf-r1": (64, 8192),
    "rans-static": (42, 512),
    "rc-o0": (1, 512),
    "rcc-o1": (2, 512),
    "rcc2": (3, 16),
    "rcx": (4, 512),
    "rcmrr": (12, 512),
    "rcrle": (13, 512),
    "rcu3": (17, 512),
    "rcqlfc": (18, 512),
    "bec": (19, 512),
    "rcg-8": (26, 512),
    "rcr-8": (28, 512),
    "ansb": (66, 512),
}


def main():
    from turborc_tpu import CodecConfig, compress
    from turborc_tpu.bench import corpus

    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = (sys.argv[2].split(",") if len(sys.argv) > 2
             else list(PAIRS))
    n = n_mb << 20
    data = corpus.get("realsrcbwt", 16 << 20)[:n]
    try:
        import pathlib
        ref = {r["id"]: r for r in json.loads(
            (pathlib.Path(__file__).parent / "_baseline"
             / "ref_realsrcbwt16.json").read_text())["rows"]}
    except Exception:
        ref = {}
    rows = []
    for name in names:
        rid, lanes = PAIRS[name]
        # rcrle's per-block gamma range caps K; give it 4MB blocks
        bs = min(n, 1 << 22) if name.startswith("rcrle") else n
        cfg = CodecConfig(codec=name, lanes=lanes, block_size=bs,
                          step_quant=64)
        blob = compress(data, cfg)
        row = {"codec": name, "ref_id": rid, "n": n,
               "ratio": round(len(blob) / n, 5)}
        if rid in ref and n == (16 << 20):
            row["ref_ratio"] = ref[rid]["ratio"]
            row["vs_ref"] = round(row["ratio"] / ref[rid]["ratio"], 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"corpus": f"realsrcbwt_{n}", "rows": rows}))


if __name__ == "__main__":
    main()
