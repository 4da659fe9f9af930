"""Order-1 flagship decision harness: ideal compressed size for
kernel-feasible quantized-context o1 CDF16 wirings on real corpora.

The reference's o1 byte codec (anscdf.c:607-645, bench id 64) keys both
nibble CDFs on the full previous byte: 256*17 CDF16 rows per model -
infeasible as per-lane VMEM state (134+ MB at 8192 lanes).  The kernel
budget is ~16 hi rows + ~32 lo rows per lane, so the candidates quantize
the context through the frequency-rank remap (rans_pallas's existing
256-byte header permutation): after remap, byte value == frequency rank,
and min(prev, C-1) with small C preserves most of the order-1 mutual
information on BWT-shaped data (runs: prev == cur dominates).

Model wirings measured (all on remapped bytes, per-lane chains):
  o0        calibration: hi | -, lo | hi          (16 + 16 rows)
  o1r<C>    hi | min(prev,C-1); lo | prev if hi==0 else hi:
            locx = hi==0 ? min(prev,15) : 16+hi   (C + 32 rows)
  o1full    hi | prev, lo | (prev,hi) - the reference wiring, measured
            at 128 lanes as the ceiling (256 + 4096 rows, diagnostic)

Modifiers:
  .p<k>     pool k adjacent CONTIGUOUS-span lanes per shared model set
            (NOT the strided share-span: each lane keeps its own byte
            chain/context, the set's updates batch-apply to one table
            per step).  Ramp divides by k; kernel realization is the
            existing per-copy diff + butterfly re-join.
  +ow       order-1 conditional warm-start tables (64 segments), header
            cost charged; default warm start broadcasts the o0 tables.

Batched-update approximation: pooled sets apply all k deltas against the
step-start table then repair+clamp (modelcost measured batched vs
sync-4 per-copy joins within 0.002 bits/B of each other, so rankings
here transfer to the kernel's join machinery).

Usage: python -m turborc_tpu.bench.o1cost <corpus> [variant ...]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16

LANES = 8192
TOTAL = 1 << 15


def _bits(freq):
    return 15.0 - jnp.log2(freq.astype(jnp.float32))


def _locx(prev, hi, full: bool, wide: bool = False, match: bool = False):
    if full:
        return prev * 16 + hi
    if match:  # match plane: prev's lo rank when prev's hi nibble == hi
        base = jnp.where(hi == 0, jnp.minimum(prev, 15), 16 + hi)
        return jnp.where((prev >> 4) == hi, 32 + (prev & 15), base)
    if wide:  # rank-conditioned lo for hi==1 too (48 rows)
        p15 = jnp.minimum(prev, 15)
        return jnp.where(hi == 0, p15,
                         jnp.where(hi == 1, 16 + p15, 32 + hi))
    return jnp.where(hi == 0, jnp.minimum(prev, 15), 16 + hi)


def _hictx(prev, C: int, linlog: bool = False):
    if linlog:  # C rows: low ranks exact, log2 buckets above
        lin = C - 8  # 24 at C=32, 56 at C=64
        t = jnp.maximum(prev - (lin - 1), 1)
        bl = jnp.zeros_like(prev)
        v = t
        for k in (4, 2, 1):
            big = v >= (1 << k)
            bl = bl + jnp.where(big, k, 0)
            v = v >> jnp.where(big, k, 0)
        bl = bl + (v > 0)
        return jnp.where(prev < lin, prev, lin + jnp.minimum(bl, 7))
    return jnp.minimum(prev, C - 1)


@functools.partial(jax.jit,
                   static_argnames=("K", "C", "full", "o0", "wide",
                                    "match", "linlog"))
def _cost(slab, K, C, full, o0, hi0, lo0, wide=False, match=False,
          linlog=False):
    """slab [S, K, k] int32 remapped bytes (k pooled lanes per set);
    hi0 [S, C, 16], lo0 [S, R, 16] warm cumulative tables."""
    S, _, k = slab.shape
    cols = jnp.transpose(slab, (1, 0, 2))  # [K, S, k]
    rows_idx = jnp.arange(S, dtype=jnp.int32)[:, None]

    def step(carry, b):
        hi_t, lo_t, prev = carry
        hi, lo = b >> 4, b & 15
        if o0:
            ctx = jnp.zeros_like(prev)
        else:
            ctx = _hictx(prev, C, linlog)
        row_h = jnp.take_along_axis(
            hi_t, jnp.broadcast_to(ctx[:, :, None], (S, k, 16)), axis=1)
        low_h, fr_h = cdf16.lookup(row_h, hi)
        bits = jnp.sum(_bits(fr_h))
        lcx = hi if o0 else _locx(prev, hi, full, wide, match)
        row_l = jnp.take_along_axis(
            lo_t, jnp.broadcast_to(lcx[:, :, None], (S, k, 16)), axis=1)
        low_l, fr_l = cdf16.lookup(row_l, lo)
        bits += jnp.sum(_bits(fr_l))
        dh = cdf16.delta(row_h, low_h)
        dl = cdf16.delta(row_l, low_l)
        hi_t = cdf16.clamp_top(cdf16._repair(
            hi_t.at[rows_idx, ctx].add(dh)))
        lo_t = cdf16.clamp_top(cdf16._repair(
            lo_t.at[rows_idx, lcx].add(dl)))
        return (hi_t, lo_t, b), bits

    prev0 = jnp.zeros((S, k), jnp.int32)
    _, bits = jax.lax.scan(step, (hi0, lo0, prev0), cols)
    return jnp.sum(bits)


def _rank_remap(data):
    counts = np.bincount(data, minlength=256)
    perm = np.argsort(-counts, kind="stable").astype(np.uint8)
    inv = np.zeros(256, np.uint8)
    inv[perm] = np.arange(256, dtype=np.uint8)
    return inv[data]


def _o0_warm(data, S, C, R, full):
    """Broadcast the o0 nibble tables over the context rows."""
    hi_f, lo_f = blockio.nibble_tables(data)
    hic = blockio.cumulative(hi_f)                    # [16]
    loc = blockio.cumulative(lo_f)                    # [16,16]
    hi0 = np.broadcast_to(hic, (S, C, 16))
    lo0 = np.zeros((R, 16), np.int64)
    if full:
        for p in range(256):
            lo0[p * 16:(p + 1) * 16] = loc
    elif R == 16:                  # o0: rows keyed by hi directly
        lo0[:] = loc
    elif R == 48:                  # wide: prev-keyed rows for hi==0 and 1
        lo0[:16] = loc[0]
        lo0[16:32] = loc[1]
        lo0[32:] = loc
    else:
        lo0[:16] = loc[0]          # hi==0 rows keyed by prev
        lo0[16:] = loc             # rows 16+h keyed by hi (row 16 unused)
    return (jnp.asarray(hi0, jnp.int32),
            jnp.asarray(np.broadcast_to(lo0, (S, R, 16)), jnp.int32))


def _np_hictx(prev, C, linlog):
    if not linlog:
        return np.minimum(prev, C - 1)
    lin = C - 8
    bl = np.zeros(257, np.int64)
    for i in range(1, 257):
        bl[i] = i.bit_length()
    return np.where(prev < lin, prev,
                    lin + np.minimum(bl[np.maximum(prev - (lin - 1), 1)],
                                     7))


def _o1_warm(data, S, C, R, full, n_seg=64, match=False, linlog=False):
    """Conditional warm tables per segment: hi | ctx and lo | locx counts.
    Header cost: n_seg * (C+R) * 16 u16 entries."""
    n = data.shape[0]
    his, los = [], []
    for g in range(n_seg):
        seg = data[g * n // n_seg:(g + 1) * n // n_seg]
        if seg.size < 2:
            seg = data
        prev = np.concatenate([[0], seg[:-1].astype(np.int32)])
        hi, lo = seg >> 4, seg & 15
        ctx = _np_hictx(prev, C, linlog)
        hc = np.zeros((C, 16), np.int64)
        np.add.at(hc, (ctx, hi), 1)
        if full:
            lcx = prev * 16 + hi
        elif match:
            base = np.where(hi == 0, np.minimum(prev, 15), 16 + hi)
            lcx = np.where((prev >> 4) == hi, 32 + (prev & 15), base)
        elif R == 48:
            p15 = np.minimum(prev, 15)
            lcx = np.where(hi == 0, p15,
                           np.where(hi == 1, 16 + p15, 32 + hi))
        else:
            lcx = np.where(hi == 0, np.minimum(prev, 15), 16 + hi)
        lc = np.zeros((R, 16), np.int64)
        np.add.at(lc, (lcx, lo), 1)
        his.append(blockio.cumulative(blockio.quantize_freqs(hc)))
        los.append(blockio.cumulative(blockio.quantize_freqs(lc)))
    # segment s of n_seg covers model sets s*S//n_seg .. (s+1)*S//n_seg
    seg_of = (np.arange(S) * n_seg) // max(S, 1)
    seg_of = np.minimum(seg_of, n_seg - 1)
    hi0 = np.stack(his)[seg_of]
    lo0 = np.stack(los)[seg_of]
    table_bytes = n_seg * (C + R) * 16 * 2
    return (jnp.asarray(hi0, jnp.int32), jnp.asarray(lo0, jnp.int32),
            table_bytes)


def measure(data: np.ndarray, variant: str) -> dict:
    n = data.shape[0]
    parts = variant.split("+")
    spec = parts[0]
    ow = "ow" in parts[1:]
    pool = 1
    if ".p" in spec:
        spec, p = spec.split(".p")
        pool = int(p)
    o0 = spec == "o0"
    full = spec == "o1full"
    wide = spec.startswith("o1w")
    match = spec.startswith("o1m")
    linlog = match
    if o0:
        C, R = 1, 16
    elif full:
        C, R = 256, 4096
    elif match:
        C, R = int(spec[3:]), 48
    elif wide:
        C, R = int(spec[3:]), 48
    else:
        C = int(spec[3:])
        R = 32
    lanes = 128 if full else LANES
    data = _rank_remap(data)
    block, K = blockio.shape_block(data, lanes, 8)
    S = lanes // pool
    # contiguous sub-spans: set s pools lanes s*pool .. s*pool+pool-1
    slab = block.reshape(S, pool, K).transpose(0, 2, 1)
    if ow:
        hi0, lo0, table_bytes = _o1_warm(data, S, C, R, full,
                                         match=match, linlog=linlog)
    else:
        hi0, lo0 = _o0_warm(data, S, C, R, full)
        table_bytes = 544
    bits = float(_cost(jnp.asarray(slab.astype(np.int32)), K, C, full, o0,
                       hi0, lo0, wide=wide, match=match, linlog=linlog))
    overhead = table_bytes + 4 * lanes + 4 * 64 + 256
    size = bits / 8 + overhead
    return {"variant": variant, "ideal_bytes": round(size),
            "ratio": size / n, "model_bits_per_byte": bits / n,
            "overhead_bytes": overhead}


def main():
    path = sys.argv[1]
    variants = sys.argv[2:] or ["o0", "o0.p8", "o1r16", "o1r16+ow",
                                "o1r16.p8+ow", "o1r32.p8+ow", "o1full"]
    data = np.fromfile(path, np.uint8)
    for v in variants:
        r = measure(data, v)
        print({k: (round(val, 5) if isinstance(val, float) else val)
               for k, val in r.items()}, flush=True)


if __name__ == "__main__":
    main()
