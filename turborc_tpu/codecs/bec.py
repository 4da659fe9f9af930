"""bec: M99-style hierarchical bit entropy coder (reference bec_.c /
bec_b.c + bectab12_.h, bench id 19).

M99 encodes a bit string by recursively halving it and coding each left-
half ones-count c under its parent constraint: given parent total t and
half size h, c lies in [max(0, t-h), min(t, h)] - an interval of size m
that shrinks to 1 (zero bits) inside runs.  The reference walks this
recursion sequentially with tuned range codes (bectab).

TPU re-design: process LEVELS, not nodes.  Level l has 2^l segments whose
constraints depend only on level l-1 - so every level is one vectorized
step and the whole codec is log2(K)-depth with NO sequential scan, for
both encode and decode.  Slots use PHASE-IN codes over their constraint
interval m (matching the reference's bectab code widths): a naive
phase-in would make decode offsets data-dependent WITHIN a level, so the
layout splits each level into a fixed-width prefix stream ((b-1)-bit
fields, offsets known from the m's alone) and a 1-bit extras stream
indexed by a prefix-sum of the "long code" mask - both fully parallel.

Bytes are coded as 8 bit-planes over the same hierarchy; 16-bit symbols
(the reference's bec16 for UTF-8 ids, bec_b.c:84-88) as 16 planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio


def _bitlen_ceil(m):
    """ceil(log2(m)) for m >= 1: number of k with 2^k < m.

    Covers m up to 2^24: constraint intervals scale with the segment
    size, and a 16-step loop silently truncated code widths for
    m > 2^16 (i.e. blocks with K >= 2^17)."""
    acc = jnp.zeros_like(m)
    for k in range(24):
        acc = acc + ((1 << k) < m).astype(m.dtype)
    return acc


def _pack(values, nbits, maxw: int = 16):
    """Pack per-slot values (flat, slot order) into a u32 word array.

    values/nbits int32 [N]; returns (words uint32 [W], total_bits).
    maxw bounds the widest field: root/phase-in widths grow with the
    segment size, so callers pass ~K.bit_length() (a 16-bit assumption
    silently truncated the stream at K >= 2^16)."""
    offs = jnp.cumsum(nbits) - nbits
    total = offs[-1] + nbits[-1] if nbits.shape[0] else jnp.int32(0)
    W = values.shape[0] * maxw // 32 + 2
    v = values.astype(jnp.uint32)
    sh = (offs & 31).astype(jnp.uint32)
    w = offs >> 5
    lo = (v << sh).astype(jnp.uint32)
    hi = jnp.where(sh > 0, v >> (32 - sh), 0).astype(jnp.uint32)
    words = jnp.zeros((W,), jnp.uint32)
    words = words.at[w].add(lo, mode="drop")
    words = words.at[w + 1].add(hi, mode="drop")
    return words, total


def _extract(words, offs, nbits):
    """Read per-slot bit fields at offsets (vectorized gather + shifts)."""
    w = offs >> 5
    sh = (offs & 31).astype(jnp.uint32)
    lo = words[w]
    hi = words[w + 1]
    val = (lo >> sh) | jnp.where(sh > 0, hi << (32 - sh), 0)
    mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << nbits.astype(jnp.uint32)) - 1)
    return (val & mask).astype(jnp.int32)


def _phase_in_enc(v, m):
    """Phase-in code fields for v in [0, m): ((prefix, b-1 bits),
    (extra bit, 1 bit iff long code)).  b = ceil(log2 m); the first
    T = 2^b - m values use the short (b-1)-bit code."""
    b = _bitlen_ceil(m)
    T = (jnp.int32(1) << b) - m
    short = v < T
    pre = jnp.where(short, v, (v + T) >> 1)
    ext = jnp.where(short, 0, (v + T) & 1)
    wpre = jnp.maximum(b - 1, 0)
    wext = jnp.where(short | (b == 0), 0, 1)
    return pre, wpre, ext, wext


@functools.partial(jax.jit, static_argnames=("K", "planes"))
def encode_device(block: jnp.ndarray, K: int, planes: int = 8):
    """block [L, K] symbols (K power of two) -> (words u32, total_bits)."""
    L = block.shape[0]
    pl = jnp.stack([(block >> b) & 1 for b in range(planes)])
    bits = pl.reshape(planes * L, K)
    levels = K.bit_length() - 1

    # count pyramid: counts[l] has 2^l segments of size K >> l
    counts = [bits.astype(jnp.int32)]
    c = counts[0]
    for _ in range(levels):
        c = c.reshape(c.shape[0], -1, 2).sum(-1)
        counts.append(c)
    counts = counts[::-1]  # counts[0] = root totals [planes*L, 1]

    vals, bitws = [], []
    # root: fixed width over [0, K]
    rootw = int(np.ceil(np.log2(K + 1)))
    vals.append(counts[0].reshape(-1))
    bitws.append(jnp.full((planes * L,), rootw, jnp.int32))
    for l in range(levels):
        t = counts[l]                      # [planes*L, 2^l] parent totals
        h = K >> (l + 1)                   # half size
        left = counts[l + 1][:, 0::2]
        lo = jnp.maximum(0, t - h)
        m = jnp.minimum(t, h) - lo + 1
        pre, wpre, ext, wext = _phase_in_enc((left - lo).reshape(-1),
                                             m.reshape(-1))
        vals += [pre, ext]
        bitws += [wpre, wext]
    return _pack(jnp.concatenate(vals), jnp.concatenate(bitws),
                 maxw=max(16, K.bit_length() + 1))


@functools.partial(jax.jit, static_argnames=("K", "L", "planes"))
def decode_device(words: jnp.ndarray, K: int, L: int, planes: int = 8):
    levels = K.bit_length() - 1
    rootw = int(np.ceil(np.log2(K + 1)))
    n = planes * L
    base = jnp.int32(0)
    offs = jnp.arange(n, dtype=jnp.int32) * rootw
    t = _extract(words, offs, jnp.full((n,), rootw, jnp.int32))
    base = base + n * rootw
    t = t.reshape(n, 1)
    for l in range(levels):
        h = K >> (l + 1)
        lo = jnp.maximum(0, t - h)
        m = (jnp.minimum(t, h) - lo + 1).reshape(-1)
        b = _bitlen_ceil(m)
        T = (jnp.int32(1) << b) - m
        wpre = jnp.maximum(b - 1, 0)
        offs = base + jnp.cumsum(wpre) - wpre
        p = _extract(words, offs, wpre)
        base = base + jnp.sum(wpre)
        need = (p >= T) & (b >= 1)
        nb = need.astype(jnp.int32)
        offs = base + jnp.cumsum(nb) - nb
        e = _extract(words, offs, nb)
        base = base + jnp.sum(nb)
        v = jnp.where(need, ((p << 1) | e) - T, p)
        left = v.reshape(t.shape) + lo
        right = t - left
        t = jnp.stack([left, right], axis=-1).reshape(n, -1)
    pls = t.reshape(planes, L, K)
    return _treesum_planes(pls, planes)


def _treesum_planes(planes_arr, planes):
    out = planes_arr[0]
    for b in range(1, planes):
        out = out | (planes_arr[b] << b)
    return out


def _make_block_api(esize: int):
    planes = 8 * esize

    def encode_block(data: np.ndarray, lanes: int = 64,
                     step_quant: int = 1024, **_unused) -> bytes:
        # K must be a power of two
        elems = data if esize == 1 else _to_u16(data)
        n = elems.shape[0]
        K = max(step_quant,
                1 << int(np.ceil(np.log2(max(-(-n // lanes), 1)))))
        padded = np.zeros(lanes * K, np.uint16 if esize == 2 else np.uint8)
        padded[:n] = elems
        block = jnp.asarray(padded.reshape(lanes, K).astype(np.int32))
        words, total = encode_device(block, K, planes)
        nw = (int(total) + 31) // 32
        return int(total).to_bytes(8, "little") + \
            np.asarray(words)[:nw].astype("<u4").tobytes()

    def decode_block(payload: bytes, n: int, lanes: int = 64,
                     step_quant: int = 1024, **_unused) -> np.ndarray:
        n_elems = -(-n // esize)
        K = max(step_quant,
                1 << int(np.ceil(np.log2(max(-(-n_elems // lanes), 1)))))
        total = int.from_bytes(payload[:8], "little")
        words = np.zeros(((total + 31) // 32) + 2, np.uint32)
        raw = np.frombuffer(payload[8:], "<u4")
        words[:raw.shape[0]] = raw
        block = np.asarray(decode_device(jnp.asarray(words), K, lanes,
                                         planes))
        flat = block.reshape(-1)[:n_elems]
        if esize == 1:
            return flat.astype(np.uint8)
        return flat.astype("<u2").view(np.uint8)[:n]

    return encode_block, decode_block


def _to_u16(data: np.ndarray) -> np.ndarray:
    pad = (-data.shape[0]) % 2
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    return data.view("<u2")


encode_block, decode_block = _make_block_api(1)
encode_block16, decode_block16 = _make_block_api(2)


# ---------------------------------------------------------------------------
# bec-w: wavelet-conditioned planes.  Independent bit-planes (above) lose
# the mutual information BETWEEN planes - measured 1.73x the reference
# bec's size on real BWT text (BENCH_REAL_r02.json), where the
# reference's M99 conditions on symbol identity.  Here plane b's bits
# are stably permuted by each position's b-bit prefix (planes are
# MSB-first), so the binary count hierarchy codes P(bit_b | prefix)
# within contiguous prefix groups: summed over planes that reaches the
# byte-conditional entropy (a wavelet tree with M99 as the node coder),
# while stable order preserves position locality inside each group.
# The decoder reconstructs the identical permutation from the planes it
# has already decoded, so plane streams are framed individually.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "b"))
def _plane_perm_enc(block, K, b):
    """(permuted bits of plane b, nothing else): stable sort by the
    b-bit prefix per lane row."""
    bit = (block >> (7 - b)) & 1
    if b == 0:
        return bit
    prefix = block >> (8 - b)
    perm = jnp.argsort(prefix, axis=1, stable=True)
    return jnp.take_along_axis(bit, perm, axis=1)


@functools.partial(jax.jit, static_argnames=("K", "b"))
def _plane_unperm_dec(acc, bits_perm, K, b):
    """Scatter plane b's decoded (permuted) bits back and OR into acc."""
    if b == 0:
        bit = bits_perm
    else:
        prefix = acc >> (8 - b)
        perm = jnp.argsort(prefix, axis=1, stable=True)
        L = acc.shape[0]
        rows = jnp.arange(L, dtype=jnp.int32)[:, None]
        bit = jnp.zeros_like(acc).at[rows, perm].set(bits_perm)
    return acc | (bit << (7 - b))


def encode_block_w(data: np.ndarray, lanes: int = 64,
                   step_quant: int = 1024, **_unused) -> bytes:
    n = data.shape[0]
    K = max(step_quant,
            1 << int(np.ceil(np.log2(max(-(-n // lanes), 1)))))
    padded = np.zeros(lanes * K, np.uint8)
    padded[:n] = data
    block = jnp.asarray(padded.reshape(lanes, K).astype(np.int32))
    out = []
    for b in range(8):
        bits = _plane_perm_enc(block, K, b)
        words, total = encode_device(bits, K, 1)
        nw = (int(total) + 31) // 32
        out.append(int(total).to_bytes(8, "little")
                   + np.asarray(words)[:nw].astype("<u4").tobytes())
    return b"".join(len(p).to_bytes(4, "little") + p for p in out)


def decode_block_w(payload: bytes, n: int, lanes: int = 64,
                   step_quant: int = 1024, **_unused) -> np.ndarray:
    K = max(step_quant,
            1 << int(np.ceil(np.log2(max(-(-n // lanes), 1)))))
    acc = jnp.zeros((lanes, K), jnp.int32)
    off = 0
    for b in range(8):
        if off + 4 > len(payload):
            raise ValueError("corrupt payload: truncated bec-w plane")
        ln = int.from_bytes(payload[off:off + 4], "little")
        off += 4
        sub = payload[off:off + ln]
        if len(sub) != ln or ln < 8:
            raise ValueError("corrupt payload: bec-w plane overruns")
        off += ln
        total = int.from_bytes(sub[:8], "little")
        words = np.zeros(((total + 31) // 32) + 2, np.uint32)
        raw = np.frombuffer(sub[8:], "<u4")
        words[:raw.shape[0]] = raw
        bits = decode_device(jnp.asarray(words), K, lanes, 1)
        acc = _plane_unperm_dec(acc, bits, K, b)
    return np.asarray(acc).reshape(-1)[:n].astype(np.uint8)
