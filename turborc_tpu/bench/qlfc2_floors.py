"""Candidate-context entropy floors for the qlfc2 BWT stage.

Caches the (heads, ranks, runs) arrays for the canonical text corpus,
then scores candidate context schemes by their static within-context
entropy (bits -> bytes).  The adaptive coder lands ~5% BELOW a static
floor on sorted streams (measured, qlfc2_split), so floors rank schemes.

Run: python -m turborc_tpu.bench.qlfc2_floors [mb]
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

from turborc_tpu.bench import corpus
from turborc_tpu.codecs import qlfc
from turborc_tpu.host import native

_CACHE = pathlib.Path(__file__).resolve().parent / "_data"


def _h_rows(joint: np.ndarray) -> float:
    c = joint.astype(np.float64)
    n = c.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(c > 0, c / np.maximum(n, 1), 1.0)
        bits = -(c * np.log2(p)).sum()
    return float(bits)


def ctx_entropy(vals, ctx, nvals) -> float:
    nctx = int(ctx.max()) + 1
    joint = np.bincount(ctx.astype(np.int64) * nvals + vals,
                        minlength=nctx * nvals).reshape(nctx, nvals)
    return _h_rows(joint) / 8


def arrays(mb: int):
    f = _CACHE / f"qlfc2_arrays_{mb}.npz"
    if f.exists():
        z = np.load(f)
        return z["heads"], z["ranks"], z["runs"]
    data = corpus.get("text", mb << 20)
    bwt_data, _, _ = native.bwt_aux(data)
    heads, runlens = qlfc.run_split(bwt_data)
    ranks, _ = native.qlfc2_ranks(heads)
    runs = (runlens - 1).astype(np.int64)
    np.savez_compressed(f, heads=heads, ranks=ranks, runs=runs)
    return heads, ranks, runs


def ricek_ema(heads, vals, shift, clip):
    """Per-symbol EMA bucket stream (replayed, vectorized per symbol)."""
    m = heads.shape[0]
    out = np.zeros(m, np.int64)
    ema = np.full(256, 4 if shift == 3 else 1, np.int64)
    v = np.minimum(vals, clip)
    hb = heads.astype(np.int64)
    # python loop is too slow for 10M; do it in order but via C-ish numpy:
    # fall back to a compiled path through native if available
    for i in range(m):
        u = hb[i]
        out[i] = min(int(ema[u]).bit_length(), 7)
        ema[u] += (v[i] - ema[u]) >> shift
    return out


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    heads, ranks, runs = arrays(mb)
    m = heads.shape[0]
    n = mb << 20
    hb = heads.astype(np.int64)
    rk = np.minimum(ranks.astype(np.int64), 255)
    rn = np.minimum(runs, 254)
    print(f"m={m} n={n}")

    kb = ricek_ema(heads, rk, 3, 31)       # RICEK(K[u]) stream
    rb = ricek_ema(heads, rn, 4, 31)       # RICEK(R[u]) stream

    base_r = ctx_entropy(rk, hb * 8 + kb, 256)
    base_n = ctx_entropy(rn, hb * 8 + rb, 255)
    print("A  current      rank", int(base_r), "run", int(base_n),
          "total", int(base_r + base_n), f"{(base_r+base_n)/n:.5f}")

    # B: joint (rank,run) nibble-pair under the current rank context
    j = np.minimum(rk, 15) * 16 + np.minimum(rn, 15)
    jb = ctx_entropy(j, hb * 8 + kb, 256)
    esc_r = int((rk > 15).sum())
    esc_n = int((rn > 15).sum())
    print("B  joint(rk,rn) ", int(jb), f"{jb/n:.5f}",
          "esc_rank", esc_r, "esc_run", esc_n)

    # C: rank with prev-rank-zero flag added to the context
    pz = np.concatenate([[0], (rk[:-1] == 0).astype(np.int64)])
    cr = ctx_entropy(rk, (hb * 8 + kb) * 2 + pz, 256)
    print("C  rank+pz      ", int(cr), f"(d={int(base_r-cr)})")

    # D: run keyed by (u, RICEK(R), rank==0)
    dz = (rk == 0).astype(np.int64)
    dn = ctx_entropy(rn, (hb * 8 + rb) * 2 + dz, 255)
    print("D  run+rk0      ", int(dn), f"(d={int(base_n-dn)})")

    # E: run keyed by (u, RICEK(R), min(rank,3))
    en = ctx_entropy(rn, (hb * 8 + rb) * 4 + np.minimum(rk, 3), 255)
    print("E  run+rk3      ", int(en), f"(d={int(base_n-en)})")

    # F: rank keyed by (u, RICEK(K), min(prev_rank,3))
    pr = np.concatenate([[0], np.minimum(rk[:-1], 3)])
    fr = ctx_entropy(rk, (hb * 8 + kb) * 4 + pr, 256)
    print("F  rank+pr3     ", int(fr), f"(d={int(base_r-fr)})")

    # G: joint with C's context
    gj = ctx_entropy(j, ((hb * 8 + kb) * 2 + pz), 256)
    print("G  joint+pz     ", int(gj), f"{gj/n:.5f}")


if __name__ == "__main__":
    main()
