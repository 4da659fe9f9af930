"""Where do the BWT lev-8 bytes go?  Stream-level split of the qlfc2
stage on the canonical 16MB text corpus, with per-context entropy floors.

Answers, without a TPU in the loop (CPU XLA twin, sub=1):
  - rank payload / run payload / header+escape split,
  - the order-0-within-context entropy floor of each sorted stream
    (what a perfect adaptive coder would pay given our contexts),
  - the same floors under finer candidate contexts, to see whether the
    remaining gap vs the reference (27.68% lev 8 @16MB same-machine) is
    in the CONTEXTS or in the CODING of the sorted streams.

Run: python -m turborc_tpu.bench.qlfc2_split [nbytes_mb]
"""
from __future__ import annotations

import json
import sys

import numpy as np

from turborc_tpu.bench import corpus
from turborc_tpu.codecs import qlfc
from turborc_tpu.host import native


def _h(counts: np.ndarray) -> float:
    """Shannon entropy (bits) of a histogram."""
    c = counts[counts > 0].astype(np.float64)
    n = c.sum()
    if n == 0:
        return 0.0
    p = c / n
    return float(-(p * np.log2(p)).sum() * n)


def ctx_entropy(vals: np.ndarray, ctx: np.ndarray, nctx: int,
                nvals: int) -> float:
    """Sum over contexts of the order-0 entropy of vals in that context
    (bits)."""
    joint = np.bincount(ctx.astype(np.int64) * nvals + vals,
                        minlength=nctx * nvals).reshape(nctx, nvals)
    return sum(_h(row) for row in joint if row.sum())


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = mb << 20
    data = corpus.get("text", n)
    # same preprocessing as bwt.encode_block lev 8
    pre = data
    u = native.utf8_remap(pre)
    if u is not None and u.shape[0] < pre.shape[0]:
        pre = u
    lz = native.lzp(pre, 32)
    if lz is not None and len(lz) <= pre.shape[0] * 0.992:
        pre = lz
    bwt_data, primary, aux = native.bwt_aux(pre)
    print(f"n={n} pre={pre.shape[0]} (utf8/lzp), bwt={bwt_data.shape[0]}")

    heads, runlens = qlfc.run_split(bwt_data)
    m = heads.shape[0]
    ranks, init_list = native.qlfc2_ranks(heads)
    runs = (runlens - 1).astype(np.int64)
    rctx, rnctx = native.qlfc2_ctx(heads, ranks,
                                   np.minimum(runs, 31).astype(np.uint32))
    print(f"m={m} mean_run={bwt_data.shape[0]/m:.2f}")

    # actual payload split (CPU twin)
    pay = qlfc.encode_block2(bwt_data, sub=1)
    import struct
    _m, ver, sub = struct.unpack_from("<QBB", pay)
    # parse the header the way decode does to locate rank_len
    off = 270
    _, off = qlfc._unvarints(pay, off, qlfc._QLFC2_NCTX)
    _, off = qlfc._unvarints(pay, off, qlfc._QLFC2_NCTX)
    (n_esc,) = struct.unpack_from("<I", pay, off)
    off += 4 + 4 * n_esc
    (rank_len,) = struct.unpack_from("<I", pay, off)
    off += 4
    head_len = off
    run_len = len(pay) - off - rank_len
    total = len(pay)
    stage_ratio = total / bwt_data.shape[0]
    e2e_ratio = total / n  # stage payload over the original input
    print(json.dumps({
        "m": int(m), "rank_pay": int(rank_len), "run_pay": int(run_len),
        "header": int(head_len), "n_esc": int(n_esc),
        "total": int(total), "stage_ratio": round(stage_ratio, 5),
        "e2e_ratio_vs_input": round(e2e_ratio, 5)}))

    # entropy floors under our contexts
    rk = np.minimum(ranks.astype(np.int64), 255)
    rn = np.minimum(runs, 254)
    er = ctx_entropy(rk, rctx, 2048, 256) / 8
    en = ctx_entropy(rn, rnctx, 2048, 255) / 8
    print(json.dumps({"floor_rank_bytes": int(er), "floor_run_bytes": int(en),
                      "floor_total": int(er + en),
                      "floor_ratio_vs_n": round((er + en) / n, 5)}))

    # candidate finer contexts, reference-style (rcqlfc_.c:51-55):
    # rank ctx = RICEK(K[u]) 3b x u 8b  (ours);  run ctx adds ku 2b
    def ricek(v):
        return np.minimum(np.int64(np.log2(np.maximum(v, 1))) + 1, 7)

    # replay EMAs to build the reference's richer run context
    K = np.full(256, 4, np.int64)
    R = np.full(256, 1, np.int64)
    rctx2 = np.zeros(m, np.int64)
    rnctx2 = np.zeros(m, np.int64)
    hb = heads.astype(np.int64)
    rb = np.minimum(runs, 31)
    kb = np.minimum(rk, 31)
    for i in range(m):
        u = hb[i]
        ku = min(int(K[u]), 14)
        ku = (ku.bit_length()) if ku else 0
        ku = min(ku, 3)
        rctx2[i] = u * 8 + min(int(K[u]).bit_length(), 7)
        rnctx2[i] = ((ku > 0) << 14) | (u * 8 + min(int(R[u]).bit_length(), 7)) | (ku << 11)
        K[u] += (kb[i] - K[u]) >> 3
        R[u] += (rb[i] - R[u]) >> 4
    # re-index run ctx densely
    _, rn2 = np.unique(rnctx2, return_inverse=True)
    en2 = ctx_entropy(rn, rn2, int(rn2.max()) + 1, 255) / 8
    print(json.dumps({"floor_run_bytes_refctx": int(en2),
                      "n_run_ctx_ref": int(rn2.max()) + 1}))


if __name__ == "__main__":
    main()
