"""Assemble the paired repo/reference BWT table (VERDICT r04 item 1).

Runs codecs/bwt.py end-to-end rows (warm second rep) for the requested
(lev, MB) points on the committed 64MB text corpus and pairs each with
the same-machine reference row from bench/_baseline/ref_bwt_text.json.

Usage: python -m turborc_tpu.bench.bwt_table [out.json]
"""
from __future__ import annotations

import json
import pathlib
import sys

from turborc_tpu.bench import bwt_row

_BASE = pathlib.Path(__file__).parent / "_baseline" / "ref_bwt_text.json"

# (lev, MB, reps).  r05: lev 8/9 at scale route to the flagship-kernel
# stages (bwt.py _FLAG_GRID) - the measured ratio-frontier geometries
# that beat the same-machine reference rcbwt ratios on every cell; lev
# 10 is the TPU-speed auto-dispatch point.
POINTS = ((8, 16, 2), (8, 64, 2), (9, 16, 2), (9, 64, 2),
          (10, 64, 2), (10, 16, 2))


def main(out_path: str | None = None):
    refs = json.loads(_BASE.read_text())["rows"]
    out = {"corpus": "turborc_tpu/bench/_data/text_67108864.bin",
           "note": "repo rows: min over 2 reps (2nd warm; JIT cached); "
                   "reference rows: same-machine single-core turborc "
                   "-e20 (bench/_baseline/ref_bwt_text.json). lev 10 is "
                   "the TPU-speed auto-dispatch stage with no reference "
                   "analog.",
           "rows": []}
    for lev, mb, reps in POINTS:
        try:
            row = bwt_row.main(lev, mb, reps=reps)
        except Exception as e:  # record the failure, keep the table
            row = {"codec": "rcbwt", "lev": lev, "mb": mb,
                   "error": f"{type(e).__name__}: {e}"}
        ref = next((r for r in refs
                    if r["lev"] == lev and r["n"] == mb << 20), None)
        if ref and "ratio" in row:
            row["ref_ratio"] = ref["ratio"]
            row["ref_enc_mbs"] = ref["enc_mbs"]
            row["ref_dec_mbs"] = ref["dec_mbs"]
            row["ratio_vs_ref"] = round(row["ratio"] / ref["ratio"], 4)
            row["dec_vs_ref"] = round(row["dec_mbs"] / ref["dec_mbs"], 4)
        out["rows"].append(row)
        if out_path:  # persist incrementally - long run
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
