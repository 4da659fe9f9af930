"""Model-cost experiment harness: ideal compressed size under CDF16
model variants, measured on real corpora.

Computes sum(-log2(freq/2^15)) over every coded nibble for a model
wiring, i.e. the exact payload size the rANS coder would produce minus
per-lane flush overhead (rANS is entropy-optimal given the freqs).  Used
to attribute the round-1 ratio gap (28.46% vs reference ans 27.32% on
identical data) to adaptation ramp / model semantics / format overhead,
and to choose round-2 ratio levers without paying kernel-dev cost per
candidate.

Variants:
  flagship   8192 lanes, global warm-start       (round-1 shipped config)
  pergroup   8192 lanes, per-group (128-lane) warm-start tables
  perlane    8192 lanes, per-lane warm-start (ramp lower bound; table
             cost would be prohibitive - diagnostic only)
  seq        128 long lanes (approximates the reference's sequential
             single-model coder; ramp amortized to ~0)
  o1hi       hi CDF additionally keyed by previous byte's hi nibble
  dual       dual-rate model: predict with mean of a fast (rate 4) and
             slow (rate 7) table, update both (reference ss-predictor
             idea, mbc_ss.h:47-63, lifted to CDF16)

Usage: python -m turborc_tpu.bench.modelcost <corpus> [variant ...]
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


@functools.partial(jax.jit, static_argnames=("K", "variant"))
def _cost_device(block, K, hi0, lo0, variant):
    """block [L, K]; hi0 [L,16], lo0 [L,16,16] warm-start cumulative."""
    L = block.shape[0]
    cols = block.T

    if variant == "dual":
        fast_hi, fast_lo = hi0, lo0

        def step(carry, b):
            cdf_hi, cdf_lo, f_hi, f_lo = carry
            hi, lo = b >> 4, b & 15
            m_hi = (cdf_hi + f_hi) >> 1
            low_h, fr_h = cdf16.lookup(m_hi, hi)
            bits = _bits(fr_h)
            cdf_hi = cdf16.update(cdf_hi, cdf16.lookup(cdf_hi, hi)[0])
            f_hi = cdf16.update_rate(f_hi, cdf16.lookup(f_hi, hi)[0], 4)
            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row_s = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            row_f = jnp.sum(f_lo * sel[:, :, None], axis=1)
            m_lo = (row_s + row_f) >> 1
            _, fr_l = cdf16.lookup(m_lo, lo)
            bits += _bits(fr_l)
            new_s = cdf16.update(row_s, cdf16.lookup(row_s, lo)[0])
            new_f = cdf16.update_rate(row_f, cdf16.lookup(row_f, lo)[0], 4)
            cdf_lo = cdf_lo + (new_s - row_s)[:, None, :] * sel[:, :, None]
            f_lo = f_lo + (new_f - row_f)[:, None, :] * sel[:, :, None]
            return (cdf_hi, cdf_lo, f_hi, f_lo), jnp.sum(bits)

        init = (hi0, lo0, fast_hi, fast_lo)
        _, bits = jax.lax.scan(step, init, cols)
        return jnp.sum(bits)

    if variant == "o1hi":
        # hi nibble keyed by previous byte's hi nibble (16 contexts),
        # lo keyed by current hi as usual
        hi_ctx0 = jnp.broadcast_to(hi0[:, None, :], (L, 16, 16))

        def step(carry, b):
            cdf_hi, cdf_lo, prev = carry
            hi, lo = b >> 4, b & 15
            pse = jax.nn.one_hot(prev, 16, dtype=cdf_hi.dtype)
            row_h = jnp.sum(cdf_hi * pse[:, :, None], axis=1)
            low_h, fr_h = cdf16.lookup(row_h, hi)
            bits = _bits(fr_h)
            new_h = cdf16.update(row_h, low_h)
            cdf_hi = cdf_hi + (new_h - row_h)[:, None, :] * pse[:, :, None]
            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            low_l, fr_l = cdf16.lookup(row, lo)
            bits += _bits(fr_l)
            new_row = cdf16.update(row, low_l)
            cdf_lo = cdf_lo + (new_row - row)[:, None, :] * sel[:, :, None]
            return (cdf_hi, cdf_lo, hi), jnp.sum(bits)

        _, bits = jax.lax.scan(step, (hi_ctx0, lo0, jnp.zeros(L, jnp.int32)),
                               cols)
        return jnp.sum(bits)

    if variant == "runflag":
        # binary match-prev flag (simple predictor, rate 5) + CDF16
        # escape; CDF16 updated only on escapes
        L0 = block.shape[0]

        def step(carry, b):
            cdf_hi, cdf_lo, prev, rl, p = carry
            match = b == prev
            ctx = jnp.minimum(rl, 3)
            psel = jnp.take_along_axis(p, ctx[:, None], 1)[:, 0]
            pm = psel.astype(jnp.float32) / 32768.0
            bits = -jnp.log2(jnp.where(match, pm, 1.0 - pm))
            upd = psel - ((psel - jnp.where(match, 1 << 15, 0)) >> 5) \
                - jnp.where(match, 0, 0)
            upd = psel + ((jnp.where(match, 1 << 15, 0) - psel) >> 5)
            p = p.at[jnp.arange(L0), ctx].set(
                jnp.clip(upd, 32, 32736))
            hi, lo = b >> 4, b & 15
            low_h, fr_h = cdf16.lookup(cdf_hi, hi)
            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            low_l, fr_l = cdf16.lookup(row, lo)
            bits += jnp.where(match, 0.0, _bits(fr_h) + _bits(fr_l))
            esc = ~match
            new_hi = cdf16.update(cdf_hi, low_h)
            cdf_hi = jnp.where(esc[:, None], new_hi, cdf_hi)
            new_row = cdf16.update(row, low_l)
            cdf_lo = cdf_lo + jnp.where(
                esc[:, None, None],
                (new_row - row)[:, None, :] * sel[:, :, None], 0)
            rl = jnp.where(match, jnp.minimum(rl + 1, 3), 0)
            return (cdf_hi, cdf_lo, b, rl, p), jnp.sum(bits)

        init = (hi0, lo0, jnp.zeros(L0, jnp.int32), jnp.zeros(L0, jnp.int32),
                jnp.full((L0, 4), 1 << 14, jnp.int32))
        _, bits = jax.lax.scan(step, init, cols)
        return jnp.sum(bits)

    rate = int(variant[4:]) if variant.startswith("rate") else cdf16.CDFRATE
    ic = int(variant[2:]) if variant.startswith("ic") else cdf16.IC
    crv = jnp.arange(16, dtype=jnp.int32) * ic

    def upd(cdf, low):
        mask = cdf > low[..., None]
        tgt = crv - cdf + jnp.where(mask, cdf16.MIXD, 0)
        return cdf16.clamp_top(cdf16._repair(cdf + (tgt >> rate)))

    def step(carry, b):
        cdf_hi, cdf_lo = carry
        hi, lo = b >> 4, b & 15
        low_h, fr_h = cdf16.lookup(cdf_hi, hi)
        bits = _bits(fr_h)
        cdf_hi = upd(cdf_hi, low_h)
        sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
        row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
        low_l, fr_l = cdf16.lookup(row, lo)
        bits += _bits(fr_l)
        new_row = upd(row, low_l)
        cdf_lo = cdf_lo + (new_row - row)[:, None, :] * sel[:, :, None]
        return (cdf_hi, cdf_lo), jnp.sum(bits)

    _, bits = jax.lax.scan(step, (hi0, lo0), cols)
    return jnp.sum(bits)


@functools.partial(jax.jit,
                   static_argnames=("K", "k", "sync", "lsync", "tiered"))
def _cost_chunk(slab, K, k, hi0, lo0, sync, lsync=0, tiered=False):
    """v3 kernel semantics: k lanes share a span; each applies its OWN
    updates immediately; every `sync` steps the copies re-join as
    start + sum of per-copy diffs (repair + clamp).  slab [M, K, k].

    lsync > sync re-joins the 256-entry LO table only every lsync bytes
    (hi stays at sync) - the lo butterfly is the decode kernel's single
    largest per-byte cost, so a ratio-neutral larger cadence is speed."""
    lsync = lsync or sync
    assert lsync % sync == 0
    M = slab.shape[0]
    cols = jnp.transpose(slab, (1, 0, 2))  # [K, M, k]
    chunks = cols.reshape(K // lsync, lsync, M, k)
    srows = 4  # tiered mode: lo rows < srows re-join at `sync`

    def one(cdf_hi, cdf_lo, b):
        hi, lo = b >> 4, b & 15
        low_h, fr_h = cdf16.lookup(cdf_hi, hi)
        bits = jnp.sum(_bits(fr_h))
        cdf_hi = cdf16.update(cdf_hi, low_h)
        sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
        row = jnp.sum(cdf_lo * sel[:, :, :, None], axis=2)
        low_l, fr_l = cdf16.lookup(row, lo)
        bits += jnp.sum(_bits(fr_l))
        new_row = cdf16.update(row, low_l)
        cdf_lo = cdf_lo + (new_row - row)[:, :, None, :] \
            * sel[:, :, :, None]
        return cdf_hi, cdf_lo, bits

    def step(carry, bs):
        cdf_hi, cdf_lo = carry   # [M, k, 16], [M, k, 16, 16]
        start_hi, start_lo = cdf_hi, cdf_lo
        bits = 0.0
        for u in range(lsync):
            cdf_hi, cdf_lo, bt = one(cdf_hi, cdf_lo, bs[u])
            bits += bt
            if (u + 1) % sync == 0 and u + 1 < lsync:
                cdf_hi = cdf16.clamp_top(cdf16._repair(
                    start_hi + (cdf_hi - start_hi).sum(axis=1,
                                                       keepdims=True)))
                start_hi = cdf_hi
                if tiered:  # hot lo rows re-join at the fast cadence
                    joined = cdf16.clamp_top(cdf16._repair(
                        start_lo + (cdf_lo - start_lo).sum(
                            axis=1, keepdims=True)))
                    hot = (jnp.arange(16) < srows)[None, None, :, None]
                    cdf_lo = jnp.where(hot, joined, cdf_lo)
                    start_lo = jnp.where(hot, joined, start_lo)
        cdf_hi = cdf16.clamp_top(cdf16._repair(
            start_hi + (cdf_hi - start_hi).sum(axis=1, keepdims=True)))
        cdf_lo = cdf16.clamp_top(cdf16._repair(
            start_lo + (cdf_lo - start_lo).sum(axis=1, keepdims=True)))
        return (cdf_hi, cdf_lo), bits

    init = (jnp.broadcast_to(hi0[:, None], (M, k, 16)),
            jnp.broadcast_to(lo0[:, None], (M, k, 16, 16)))
    _, bits = jax.lax.scan(step, init, chunks)
    return jnp.sum(bits)


@functools.partial(jax.jit, static_argnames=("K", "k", "batched"))
def _cost_shared(slab, K, k, hi0, lo0, batched=False):
    """Model shared by k states with lag: slab [M, K, k]; one model pair
    per row codes k symbols per step from the pre-step tables (decode-time
    lag k-1), then applies the k updates in position order.  This is the
    kernel-implementable 'share-k' wiring: k physical lanes (or k rANS
    states per lane) cover one contiguous k*K span with stride k."""
    cols = jnp.transpose(slab, (1, 0, 2))  # [K, M, k]

    def step(carry, bk):
        cdf_hi, cdf_lo = carry
        bits = 0.0
        # all k symbols priced from the pre-step tables (lag)
        his, sels = [], []
        for j in range(k):
            b = bk[:, j]
            hi, lo = b >> 4, b & 15
            _, fr_h = cdf16.lookup(cdf_hi, hi)
            bits += jnp.sum(_bits(fr_h))
            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            _, fr_l = cdf16.lookup(row, lo)
            bits += jnp.sum(_bits(fr_l))
            his.append(hi)
            sels.append(sel)
        if batched:
            # one batched update per table per step: targets averaged over
            # the k symbols (kernel-cheap: one shift-add, k compares)
            lows_h = [cdf16.lookup(cdf_hi, bk[:, j] >> 4)[0]
                      for j in range(k)]
            cdf_hi = cdf16.update_batch(cdf_hi, lows_h)
            # lo rows: per row h, batch the symbols that hit it
            upds = jnp.zeros_like(cdf_lo)
            cnt = jnp.zeros(cdf_lo.shape[:1] + (16, 1), cdf_lo.dtype)
            for j in range(k):
                b = bk[:, j]
                sel = sels[j]
                row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
                low_l, _ = cdf16.lookup(row, b & 15)
                mask = row > low_l[:, None]
                tgt = (jnp.asarray(cdf16._CRV, cdf_lo.dtype) - row
                       + jnp.where(mask, cdf16.MIXD, 0))
                upds = upds + tgt[:, None, :] * sel[:, :, None]
                cnt = cnt + sel[:, :, None]
            del cnt
            cdf_lo = cdf16.clamp_top(
                cdf16._repair(cdf_lo + (upds >> cdf16.CDFRATE)))
        else:
            # apply the k updates serially in position order
            for j in range(k):
                b = bk[:, j]
                hi, lo = b >> 4, b & 15
                low_h, _ = cdf16.lookup(cdf_hi, hi)
                cdf_hi = cdf16.update(cdf_hi, low_h)
                sel = sels[j]
                row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
                low_l, _ = cdf16.lookup(row, lo)
                new_row = cdf16.update(row, low_l)
                cdf_lo = cdf_lo + (new_row - row)[:, None, :] \
                    * sel[:, :, None]
        return (cdf_hi, cdf_lo), bits

    _, bits = jax.lax.scan(step, (hi0, lo0), cols)
    return jnp.sum(bits)


def _warm(data, lanes):
    hi_f, lo_f = blockio.nibble_tables(data)
    hi = jnp.broadcast_to(jnp.asarray(blockio.cumulative(hi_f)), (lanes, 16))
    lo = jnp.broadcast_to(jnp.asarray(blockio.cumulative(lo_f)),
                          (lanes, 16, 16))
    return hi, lo


def _warm_perlane(block):
    """Vectorized per-lane nibble tables for [L, K] blocks."""
    L = block.shape[0]
    hi, lo = block >> 4, block & 15
    joint = (hi.astype(np.int32) << 4) | lo
    hi_c = np.zeros((L, 16), np.int64)
    jo_c = np.zeros((L, 256), np.int64)
    rows = np.repeat(np.arange(L), block.shape[1])
    np.add.at(hi_c, (rows, hi.ravel()), 1)
    np.add.at(jo_c, (rows, joint.ravel()), 1)
    hi0 = blockio.cumulative(blockio.quantize_freqs(hi_c))
    lo0 = blockio.cumulative(blockio.quantize_freqs(jo_c.reshape(L, 16, 16)))
    return jnp.asarray(hi0), jnp.asarray(lo0)


def _rank_remap(data):
    """Frequency-rank byte permutation (header: 256-byte table)."""
    counts = np.bincount(data, minlength=256)
    perm = np.argsort(-counts, kind="stable").astype(np.uint8)
    inv = np.zeros(256, np.uint8)
    inv[perm] = np.arange(256, dtype=np.uint8)
    return inv[data]


def measure(data: np.ndarray, variant: str) -> dict:
    n = data.shape[0]
    parts = variant.split("+")
    lanes = 128 if parts[0].split(".")[0] == "seq" else LANES
    if parts[0].startswith(("share", "chunk")):
        chunked = parts[0].startswith("chunk")
        spec = parts[0][5:]
        batched = spec.endswith("b")
        lsync = 0
        tiered = False
        if chunked and "t" in spec:
            spec, ls = spec.split("t")
            lsync = int(ls.rstrip("b"))
            tiered = True
        elif chunked and "x" in spec:
            spec, ls = spec.split("x")
            lsync = int(ls.rstrip("b"))
        sync = int(spec.rstrip("b")) if chunked else 1
        k = 8 if chunked else int(spec.rstrip("b"))
        overhead = 544 + 4 * LANES + 4 * 64
        if "rm" in parts:
            data = _rank_remap(data)
            overhead += 256
        M = LANES // k
        block, KK = blockio.shape_block(
            data, M, 8 * k * (max(sync, lsync) if chunked else 1))
        K = KK // k
        slab = block.reshape(M, K, k)
        if "pg" in parts:
            glanes = M // 64
            his, los = [], []
            for g in range(64):
                seg = data[g * (n // 64):(g + 1) * (n // 64)]
                hi_f, lo_f = blockio.nibble_tables(seg)
                his.append(np.broadcast_to(blockio.cumulative(hi_f),
                                           (glanes, 16)))
                los.append(np.broadcast_to(blockio.cumulative(lo_f),
                                           (glanes, 16, 16)))
            hi0 = jnp.asarray(np.concatenate(his))
            lo0 = jnp.asarray(np.concatenate(los))
            overhead += 63 * 544
        else:
            hi0, lo0 = _warm(data, M)
        if chunked:
            bits = float(_cost_chunk(jnp.asarray(slab), K, k, hi0, lo0,
                                     sync, lsync, tiered))
        else:
            bits = float(_cost_shared(jnp.asarray(slab), K, k, hi0, lo0,
                                      batched))
        size = bits / 8 + overhead
        return {"variant": variant, "ideal_bytes": round(size),
                "ratio": size / n, "model_bits_per_byte": bits / n,
                "overhead_bytes": overhead}
    if "rm" in parts:
        data = _rank_remap(data)
        variant = parts[0]
    block, K = blockio.shape_block(data, lanes, 8)
    if variant == "pergroup":
        glanes = lanes // 64
        his, los = [], []
        for g in range(64):
            seg = data[g * (n // 64):(g + 1) * (n // 64)]
            hi_f, lo_f = blockio.nibble_tables(seg)
            his.append(np.broadcast_to(blockio.cumulative(hi_f),
                                       (glanes, 16)))
            los.append(np.broadcast_to(blockio.cumulative(lo_f),
                                       (glanes, 16, 16)))
        hi0 = jnp.asarray(np.concatenate(his))
        lo0 = jnp.asarray(np.concatenate(los))
        table_bytes = 64 * 544
    elif variant == "perlane":
        hi0, lo0 = _warm_perlane(block)
        table_bytes = lanes * 544
    else:
        hi0, lo0 = _warm(data, lanes)
        table_bytes = 544
    inner = variant.split(".")[-1] if "." in variant else variant
    v = inner if (inner in ("o1hi", "dual", "runflag")
                  or inner.startswith(("rate", "ic"))) else "o0"
    bits = float(_cost_device(jnp.asarray(block), K, hi0, lo0, v))
    # container overhead: warm tables + per-lane state/length bookkeeping
    overhead = table_bytes + 4 * lanes + 4 * 64
    size = bits / 8 + overhead
    return {"variant": variant, "ideal_bytes": round(size),
            "ratio": size / n, "model_bits_per_byte": bits / n,
            "overhead_bytes": overhead}


def main():
    path = sys.argv[1]
    variants = sys.argv[2:] or ["flagship", "pergroup", "perlane", "seq",
                                "o1hi", "dual", "share2", "share4", "share8"]
    data = np.fromfile(path, np.uint8)
    for v in variants:
        r = measure(data, v)
        print({k: (round(val, 5) if isinstance(val, float) else val)
               for k, val in r.items()}, flush=True)


if __name__ == "__main__":
    main()
