"""Full-registry codec battery (VERDICT r04 item 6).

Runs EVERY registered codec: encode + decode + verify, min over REPS
reps (first rep warms the jit cache and is excluded).  Size class per
codec: kernel/table codecs run the full 16MB textbwt; the bitwise
XLA-scan families run a 2MB slice (their ~1 MB/s scan speed makes 16MB
x 3 reps a multi-hour battery; the class split is recorded per row).

Same-machine reference columns join by counterpart id where one exists
(bench/_baseline/ref_textbwt64.json - the reference binary run on this
machine on the 64MB parent corpus; ratios comparable, speeds are
single-core CPU).

Run: python -m turborc_tpu.bench.codec_table [--out PATH] [--only a,b]
     [--skip a,b] [--mb 16] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import time
import traceback

import numpy as np

from turborc_tpu.bench import corpus
from turborc_tpu.codecs import registry

_BASE = pathlib.Path(__file__).parent / "_baseline" / "ref_textbwt64.json"

# XLA-scan families: correct but ~0.1-3 MB/s on any backend; 2MB class.
_SLOW_PREFIXES = ("rc-o0", "rcc-o1", "rcc2", "rcx", "rc2b", "rc3b",
                  "rc4b", "rc5b", "rc6b", "rc7b", "rc10b", "rc12b",
                  "rc-16", "rc-32", "rcm", "rcrle", "rcqlfc", "rcg",
                  "rcr-", "rcrz", "rcgz", "rcv", "rcu3", "ansb", "rc4",
                  "bec", "rc-rc", "rcbwt", "rans-v")
_SLOW_SIZE = 2 << 20


def _is_slow(name: str) -> bool:
    return any(name == p or name.startswith(p) for p in _SLOW_PREFIXES) \
        and not name.endswith("-p")


def run_codec(c, data: np.ndarray, reps: int, mod: int = 256):
    n = data.shape[0]
    pays, et, dt = None, [], []
    for r in range(reps + 1):
        d = data if r == 0 else ((data.astype(np.int32) + r) % mod
                                 ).astype(np.uint8)
        t0 = time.perf_counter()
        pay = c.encode_block(d)
        e = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = c.decode_block(pay, n)
        t = time.perf_counter() - t0
        if not np.array_equal(np.asarray(out, np.uint8), d):
            return {"codec": c.name, "id": c.codec_id, "ok": False,
                    "error": "roundtrip mismatch"}
        if r == 0:
            pays = len(pay)
        else:
            et.append(e)
            dt.append(t)
    return {"codec": c.name, "id": c.codec_id, "ok": True, "bytes": n,
            "csize": pays, "ratio": round(pays / n, 5),
            "enc_mbs": round(n / min(et) / 1e6, 3),
            "dec_mbs": round(n / min(dt) / 1e6, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_TABLE_r05.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    import jax
    full = corpus.get("textbwt", args.mb << 20)
    small = full[:_SLOW_SIZE]
    refs = {r["id"]: r for r in json.loads(_BASE.read_text())["rows"]}

    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))
    out_p = pathlib.Path(args.out)
    rows = []
    if args.append and out_p.exists():
        # keep only successful rows: failures retry (e.g. after a fix)
        rows = [r for r in json.loads(out_p.read_text())["rows"]
                if r.get("ok")]
    done = {r["codec"] for r in rows}

    names = sorted(registry._BY_NAME)
    for name in names:
        if only and name not in only:
            continue
        if name in skip or name in done:
            continue
        c = registry.get(name)
        data = small if _is_slow(name) else full
        # n-bit tree codecs code a <8-bit alphabet by contract
        # (reference rc2b..rc7b, mb_o0.h): mask the corpus to fit, and
        # keep the per-rep distinct-input shift inside the alphabet
        mod = 256
        if name.startswith("rc") and name.endswith("b") \
                and name[2:-1].isdigit():
            mod = 1 << int(name[2:-1])
            data = (data & (mod - 1)).astype(np.uint8)
        t0 = time.time()
        try:
            row = run_codec(c, data, args.reps, mod)
        except Exception as e:  # noqa: BLE001 - battery must survive
            row = {"codec": name, "id": c.codec_id, "ok": False,
                   "error": f"{type(e).__name__}: {e}",
                   "trace": traceback.format_exc()[-400:]}
        row["size_class"] = "2MB" if _is_slow(name) else f"{args.mb}MB"
        row["wall_s"] = round(time.time() - t0, 1)
        ref = refs.get(c.codec_id)
        if ref and row.get("ok"):
            row["ref_same_machine"] = {
                "ratio": ref["ratio"], "enc_mbs": ref["enc_mbs"],
                "dec_mbs": ref["dec_mbs"], "corpus": "textbwt64"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        out_p.write_text(json.dumps({
            "input": f"textbwt_{args.mb << 20}.bin (slow class: first "
                     f"{_SLOW_SIZE >> 20}MB slice)",
            "reps": args.reps, "device": str(jax.devices()[0]),
            "note": "min over reps (first rep warm, excluded); "
                    "ref columns = reference binary on this machine, "
                    "64MB parent corpus",
            "rows": rows}, indent=1))
    print(f"done: {len(rows)} rows -> {out_p}")


if __name__ == "__main__":
    main()
