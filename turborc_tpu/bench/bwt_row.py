"""One rcbwt end-to-end bench row (VERDICT r04 item 1).

Usage: python -m turborc_tpu.bench.bwt_row <lev> <mb> [out.json] [reps]

Measures encode/decode wall time (min over reps, warm second rep by
default) for `codecs/bwt.py` on the first <mb> MB of the committed 64MB
text corpus, pairing with the same-machine reference rows in
bench/_baseline/ref_bwt_text.json.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

from turborc_tpu.codecs import bwt


def main(lev: int, mb: int, out_path=None, reps: int = 2):
    n = mb << 20
    data = np.fromfile("turborc_tpu/bench/_data/text_67108864.bin",
                       np.uint8)[:n]
    enc_s = dec_s = float("inf")
    pay = None
    for _ in range(reps):
        t0 = time.perf_counter()
        pay = bwt.encode_block(data, level=lev)
        enc_s = min(enc_s, time.perf_counter() - t0)
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = bwt.decode_block(pay, n, level=lev)
        dec_s = min(dec_s, time.perf_counter() - t0)
    row = {"codec": "rcbwt", "lev": lev, "mb": mb,
           "csize": len(pay), "ratio": round(len(pay) / n, 5),
           "enc_mbs": round(n / enc_s / 1e6, 2),
           "dec_mbs": round(n / dec_s / 1e6, 2),
           "roundtrip_ok": bool(np.array_equal(out, data))}
    print(json.dumps(row), flush=True)
    if out_path:
        with open(out_path, "w") as fo:
            json.dump(row, fo, indent=1)
    return row


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]), int(a[1]), a[2] if len(a) > 2 else None,
         int(a[3]) if len(a) > 3 else 2)
