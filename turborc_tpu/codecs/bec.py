"""bec: M99-style hierarchical bit entropy coder (reference bec_.c /
bec_b.c + bectab12_.h, bench id 19).

M99 encodes a bit string by recursively halving it and coding each left-
half ones-count c under its parent constraint: given parent total t and
half size h, c lies in [max(0, t-h), min(t, h)] - an interval of size m
that shrinks to 1 (zero bits) inside runs.  The reference walks this
recursion sequentially with tuned range codes (bectab12_.h is just an
acceleration LUT for the same truncated-binary code this module emits:
bec_bstm.h stmput0_ computes cl = bsr(n), msb-extension - identical
widths).

Host re-design (round 3): process LEVELS, not nodes, over an ACTIVE
SEGMENT SET.  Level l has 2^l segments whose constraints depend only on
level l-1; segments whose parent count is saturated (0 or == size) have
interval m = 1 and code zero bits, so they are pruned from the working
set entirely - the round-2 formulation materialized every slot
(2*planes*n of them), which is why its TPU decode measured 0.02 MB/s.
With pruning, work is proportional to the number of UNRESOLVED segments
(~= bit transitions), vectorized numpy per level.  SURVEY section 2.6
marks bec "[host or kernel]"; the recursion's data-dependent active
sets make it the host disposition, like the BWT itself.

Slots use PHASE-IN (truncated binary) codes over their constraint
interval m, split into a fixed-width prefix stream ((b-1)-bit fields,
offsets known from the m's alone) and a 1-bit extras stream - the
decoder knows every width before reading.

Three registered codecs:
  19  bec     wavelet-conditioned planes (plane b permuted by each
              position's b-bit prefix): codes P(bit_b | prefix), which
              carries the inter-plane mutual information the reference's
              symbol-recursive M99 captures (measured 1.05x ref vs the
              independent planes' 1.73x on real BWT text)
  22  bec-i   independent bit planes over the same hierarchy
  119 bec-16  16-bit symbols (reference bec16 for UTF-8 ids,
              bec_b.c:84-88)
"""
from __future__ import annotations

import numpy as np


def _blc(m):
    """ceil(log2(m)) for m >= 1 (bit length of m-1)."""
    out = np.zeros(m.shape, np.int64)
    v = (np.asarray(m, np.int64) - 1).clip(min=0)  # bits of (m-1)
    for k in (16, 8, 4, 2, 1):
        big = v >= (1 << k)
        out += np.where(big, k, 0)
        v >>= np.where(big, k, 0)
    return out + (v > 0)


class _BitWriter:
    """Append variable-width fields (vectorized); little-endian bit order
    within u64 words (field k occupies bits [off, off+w))."""

    def __init__(self):
        self.parts = []          # (values u64, widths i64) chunks
        self.total = 0

    def put(self, vals: np.ndarray, widths: np.ndarray):
        if vals.size:
            self.parts.append((vals.astype(np.uint64),
                               widths.astype(np.int64)))
            self.total += int(widths.sum())

    def pack(self) -> bytes:
        if not self.parts:
            return b""
        vals = np.concatenate([v for v, _ in self.parts])
        widths = np.concatenate([w for _, w in self.parts])
        offs = np.cumsum(widths) - widths
        W = (self.total + 63) // 64 + 1
        words = np.zeros(W, np.uint64)
        w = (offs >> 6).astype(np.int64)
        sh = (offs & 63).astype(np.uint64)
        lo = (vals << sh)
        hi = np.where(sh > 0, vals >> (np.uint64(64) - sh), np.uint64(0))
        np.bitwise_or.at(words, w, lo)
        np.bitwise_or.at(words, w + 1, hi)
        return words.tobytes()


class _BitReader:
    """Sequential vectorized reads of variable-width field batches."""

    def __init__(self, buf: bytes):
        pad = (-len(buf)) % 8
        self.words = np.frombuffer(buf + b"\0" * (8 + pad), np.uint64)
        self.pos = 0

    def get(self, widths: np.ndarray) -> np.ndarray:
        widths = widths.astype(np.int64)
        offs = self.pos + np.cumsum(widths) - widths
        self.pos = int(self.pos + widths.sum())
        if self.pos > (len(self.words) - 1) * 64:
            raise ValueError("corrupt payload: bec stream overruns")
        w = (offs >> 6).astype(np.int64)
        sh = (offs & 63).astype(np.uint64)
        lo = self.words[w] >> sh
        hi = np.where(sh > 0, self.words[w + 1] << (np.uint64(64) - sh),
                      np.uint64(0))
        mask = np.where(widths >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                        (np.uint64(1) << widths.astype(np.uint64))
                        - np.uint64(1))
        return ((lo | hi) & mask).astype(np.int64)


def _phase_in_fields(v, m):
    """Truncated-binary fields for v in [0, m): (prefix, wpre, extra,
    wext).  b = ceil(log2 m); first T = 2^b - m values use b-1 bits."""
    b = _blc(m)
    T = (np.int64(1) << b) - m
    short = v < T
    pre = np.where(short, v, (v + T) >> 1)
    ext = np.where(short, 0, (v + T) & 1)
    wpre = np.maximum(b - 1, 0)
    wext = np.where(short | (b == 0), 0, 1)
    return pre, wpre, ext, wext


def _phase_in_read(rd: _BitReader, m):
    b = _blc(m)
    T = (np.int64(1) << b) - m
    pre = rd.get(np.maximum(b - 1, 0))
    need = (pre >= T) & (b >= 1)
    ext = rd.get(need.astype(np.int64))
    return np.where(need, ((pre << 1) | ext) - T, pre)


def _encode_forest(bits2d: np.ndarray, wr: _BitWriter):
    """bits2d: [R, K] 0/1 rows (K power of two).  Each row is one M99
    tree; rows batch as a forest because with row-major level layout the
    children of flat node f at level l are exactly 2f and 2f+1.  Emits
    R root counts + per-level phase-in fields over the active set."""
    R, K = bits2d.shape
    levels = int(K).bit_length() - 1
    pyramid = [bits2d.reshape(-1).astype(np.int64)]
    c = pyramid[0]
    for _ in range(levels):
        c = c.reshape(-1, 2).sum(-1)
        pyramid.append(c)
    pyramid = pyramid[::-1]       # pyramid[l]: [R * 2^l] segment counts
    rootw = int(K).bit_length()   # root value in [0, K]
    roots = pyramid[0]
    wr.put(roots, np.full(R, rootw))
    active = np.flatnonzero((roots > 0) & (roots < K))
    for l in range(levels):
        if active.size == 0:
            break
        h = K >> (l + 1)          # half size at this level
        t = pyramid[l][active]
        left = pyramid[l + 1][2 * active]
        lo = np.maximum(0, t - h)
        m = np.minimum(t, h) - lo + 1
        pre, wpre, ext, wext = _phase_in_fields(left - lo, m)
        wr.put(pre, wpre)
        wr.put(ext, wext)
        if l + 1 < levels:        # children with 0 < count < child size
            kids = np.stack([2 * active, 2 * active + 1], -1).reshape(-1)
            kc = pyramid[l + 1][kids]
            active = kids[(kc > 0) & (kc < h)]


def _decode_forest(rd: _BitReader, R: int, K: int) -> np.ndarray:
    """Inverse of _encode_forest: returns bits2d [R, K] uint8."""
    levels = int(K).bit_length() - 1
    rootw = int(K).bit_length()
    counts = rd.get(np.full(R, rootw))
    if (counts < 0).any() or (counts > K).any():
        raise ValueError("corrupt payload: bec root count out of range")
    active = np.flatnonzero((counts > 0) & (counts < K))
    for l in range(levels):
        h = K >> (l + 1)
        nxt = np.empty(counts.size * 2, np.int64)
        # saturated segments split trivially (all-zero / all-one fill)
        nxt[0::2] = np.minimum(counts, h)
        nxt[1::2] = counts - nxt[0::2]
        if active.size:
            t = counts[active]
            lo = np.maximum(0, t - h)
            m = np.minimum(t, h) - lo + 1
            v = _phase_in_read(rd, m)
            if (v < 0).any() or (v >= m).any():
                raise ValueError("corrupt payload: bec count out of range")
            left = v + lo
            nxt[2 * active] = left
            nxt[2 * active + 1] = t - left
        counts = nxt
        if l + 1 < levels:
            if active.size:
                kids = np.stack([2 * active, 2 * active + 1],
                                -1).reshape(-1)
                kc = counts[kids]
                active = kids[(kc > 0) & (kc < h)]
            else:
                active = np.zeros(0, np.int64)
    return counts.reshape(R, K).astype(np.uint8)


def _pow2_K(n_elems: int, lanes: int, step_quant: int) -> int:
    return max(step_quant,
               1 << int(np.ceil(np.log2(max(-(-n_elems // lanes), 1)))))


def _frame(wr: _BitWriter) -> bytes:
    body = wr.pack()
    return int(wr.total).to_bytes(8, "little") + body


def _reader(payload: bytes) -> _BitReader:
    if len(payload) < 8:
        raise ValueError("corrupt payload: truncated bec header")
    total = int.from_bytes(payload[:8], "little")
    if len(payload) - 8 < (total + 7) // 8 - 7:
        raise ValueError("corrupt payload: bec stream too short")
    return _BitReader(payload[8:])


def _make_block_api(esize: int):
    planes = 8 * esize

    def encode_block(data: np.ndarray, lanes: int = 64,
                     step_quant: int = 1024, **_unused) -> bytes:
        elems = data if esize == 1 else _to_u16(data)
        n = elems.shape[0]
        K = _pow2_K(n, lanes, step_quant)
        padded = np.zeros(lanes * K, np.uint16 if esize == 2 else np.uint8)
        padded[:n] = elems
        rows = padded.reshape(lanes, K).astype(np.int64)
        wr = _BitWriter()
        planes_bits = np.concatenate(
            [(rows >> b) & 1 for b in range(planes)], axis=0)
        _encode_forest(planes_bits, wr)
        return _frame(wr)

    def decode_block(payload: bytes, n: int, lanes: int = 64,
                     step_quant: int = 1024, **_unused) -> np.ndarray:
        n_elems = -(-n // esize)
        K = _pow2_K(n_elems, lanes, step_quant)
        rd = _reader(payload)
        bits = _decode_forest(rd, planes * lanes, K).astype(np.int64)
        bits = bits.reshape(planes, lanes, K)
        acc = np.zeros((lanes, K), np.int64)
        for b in range(planes):
            acc |= bits[b] << b
        flat = acc.reshape(-1)[:n_elems]
        if esize == 1:
            return flat.astype(np.uint8)
        return flat.astype("<u2").view(np.uint8)[:n]

    return encode_block, decode_block


def _to_u16(data: np.ndarray) -> np.ndarray:
    pad = (-data.shape[0]) % 2
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    return data.view("<u2")


encode_block_i, decode_block_i = _make_block_api(1)
encode_block16, decode_block16 = _make_block_api(2)


# ---------------------------------------------------------------------------
# bec (id 19, round-3 default): wavelet-conditioned planes.  Independent
# bit-planes lose the mutual information BETWEEN planes - measured 1.73x
# the reference bec's size on real BWT text (BENCH_REAL_r02.json), where
# the reference's M99 conditions on symbol identity.  Here plane b's bits
# are stably permuted by each position's b-bit prefix (planes are
# MSB-first), so the binary count hierarchy codes P(bit_b | prefix)
# within contiguous prefix groups: summed over planes that reaches the
# byte-conditional entropy (a wavelet tree with M99 as the node coder),
# while stable order preserves position locality inside each group.
# The decoder reconstructs the identical permutation from the planes it
# has already decoded.
# ---------------------------------------------------------------------------

def _stable_perm_by_prefix(prefix: np.ndarray) -> np.ndarray:
    """[L, K] keys -> [L, K] stable per-row argsort (counting-style via
    one global stable argsort on row-offset keys)."""
    L, K = prefix.shape
    keys = prefix.astype(np.int64) + \
        (np.arange(L, dtype=np.int64)[:, None] << 32)
    return np.argsort(keys.reshape(-1), kind="stable").reshape(L, K) \
        - (np.arange(L, dtype=np.int64)[:, None] * K)


def _native_becw():
    """Native host coder (host/bec.cpp), or None.  Same wire format as
    the numpy spec below (parity-tested); TRC_BEC_HOST=py forces numpy."""
    import os
    if os.environ.get("TRC_BEC_HOST") == "py":
        return None
    try:
        from turborc_tpu.host import native
        native._bec_bind()
        return native
    except Exception:
        return None


def encode_block_w(data: np.ndarray, lanes: int = 64,
                   step_quant: int = 1024, **_unused) -> bytes:
    n = data.shape[0]
    K = _pow2_K(n, lanes, step_quant)
    padded = np.zeros(lanes * K, np.uint8)
    padded[:n] = data
    nat = _native_becw()
    if nat is not None:
        nbits, body = nat.becw_enc(padded.reshape(lanes, K))
        return nbits.to_bytes(8, "little") + body
    block = padded.reshape(lanes, K).astype(np.int64)
    wr = _BitWriter()
    for b in range(8):
        bit = (block >> (7 - b)) & 1
        if b > 0:
            perm = _stable_perm_by_prefix(block >> (8 - b))
            bit = np.take_along_axis(bit, perm, axis=1)
        _encode_forest(bit, wr)
    return _frame(wr)


def decode_block_w(payload: bytes, n: int, lanes: int = 64,
                   step_quant: int = 1024, **_unused) -> np.ndarray:
    K = _pow2_K(n, lanes, step_quant)
    rd = _reader(payload)  # frame/length validation both paths
    nat = _native_becw()
    if nat is not None:
        block = nat.becw_dec(payload[8:], lanes, K)
        return block.reshape(-1)[:n]
    acc = np.zeros((lanes, K), np.int64)
    rows = np.arange(lanes, dtype=np.int64)[:, None]
    for b in range(8):
        bits = _decode_forest(rd, lanes, K).astype(np.int64)
        if b > 0:
            perm = _stable_perm_by_prefix(acc >> (8 - b))
            out = np.zeros_like(bits)
            out[rows, perm] = bits
            bits = out
        acc |= bits << (7 - b)
    return acc.reshape(-1)[:n].astype(np.uint8)


# id 19 rides the wavelet-conditioned design (VERDICT round-2 item 5:
# promote bec-w); the independent-plane variant stays as bec-i (id 22).
encode_block, decode_block = encode_block_w, decode_block_w
