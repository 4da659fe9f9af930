"""Integer coders: gamma, rice, u3 (segmented varint), Turbo-VLC.

Reference counterparts (SURVEY.md section 2.4): rcg/rcgz (mb_vint.h:85-135),
rcr/rcrz with adaptive Rice parameter k=bsr32(ema+1), ema=(63*ema+x+16)>>6
(rc_.c:632-731, rcutil_.h:126-127), rcu3 (mb_vint.h:235-263, rc_.c:439-462),
rcv (mb_vint.h:214-232).

All are built as "slotted" codecs (ops/slotted.py): every element of width
W bits compiles to a fixed slot budget of masked binary decisions; the
probability models match the reference's layout:
  gamma: mg0 flag + mgu[W] unary + mgb[W][W] mantissa-with-length-context
  rice:  mgu unary quotient (limited qmax=12 + escape) + mgb mantissa
  u3:    3 flag models + three binary-tree value models (1/3/5/8 bits)
Zigzag/delta variants are the same coders behind transforms/ (applied by
the registry wrappers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.ops import binary, rans, slotted

RICEMAX = 12


# ---------------------------------------------------------------------------
# gamma
# ---------------------------------------------------------------------------

def _gamma_models(L, W):
    # [0] = mg0, [1..W] = mgu, [1+W ...] = mgb[gb-1][gi]
    return slotted.ModelTable(L, 1 + W + W * W)


def _idx(v, u):
    """Model-index helper: int32 constant array shaped like v."""
    return jnp.full(v.shape, u, jnp.int32)


def _gamma_enc(rec, m, v, W, raw_mantissa=False, active=None):
    """Gamma-code v: zero flag + unary bitlen + modeled mantissa.

    Width-safe formulation (works up to W=32 in uint32): the flag codes
    v==0 directly, then gamma codes v itself (gb = bitlen(v)-1 in
    0..W-1), so no +1 overflow at the top of the range.

    raw_mantissa=True is the Turbo-VLC trade (mb_vint.h:214-232 /
    vlcbit.h): mantissa bits cost exactly 1 bit each (fixed p=1/2, no
    model) - faster and smaller state, slightly worse ratio.
    `active` masks the whole symbol (for composing codecs, e.g. RLE runs).
    """
    one = (jnp.ones(v.shape, jnp.bool_) if active is None
           else active.astype(jnp.bool_))
    vz = v == 0
    rec.code(m, _idx(v, 0), vz, one)
    act = one & ~vz
    gb = jnp.maximum(slotted.bitlen(v, W).astype(jnp.int32) - 1, 0)
    for u in range(W):
        rec.code(m, _idx(v, 1 + u), u == gb, act & (u <= gb))
    for j in range(W - 1):
        a = act & (j < gb)
        gi = jnp.where(a, gb - 1 - j, 0)
        bit = (v >> gi.astype(v.dtype)) & v.dtype.type(1)
        if raw_mantissa:
            rec.code_raw(bit, a)
        else:
            rec.code(m, 1 + W + gb * W + gi, bit, a)


def _gamma_dec(dec, m, W, like, raw_mantissa=False, active=None):
    one = (jnp.ones(like.shape, jnp.bool_) if active is None
           else active.astype(jnp.bool_))
    vz = dec.read(m, _idx(like, 0), one)
    act = one & ~vz
    gb = jnp.zeros(like.shape, jnp.int32)
    ufin = jnp.zeros(like.shape, jnp.bool_)
    for u in range(W):
        a = act & ~ufin
        bit = dec.read(m, _idx(like, 1 + u), a)
        ufin = ufin | bit
        gb = gb + (a & ~bit).astype(jnp.int32)
    x = jnp.ones(like.shape, like.dtype)
    for j in range(W - 1):
        a = act & (j < gb)
        gi = jnp.where(a, gb - 1 - j, 0)
        if raw_mantissa:
            bit = dec.read_raw(a)
        else:
            bit = dec.read(m, 1 + W + gb * W + gi, a)
        x = jnp.where(a, (x << 1) | bit.astype(like.dtype), x)
    return jnp.where(vz, like.dtype.type(0), x)


# ---------------------------------------------------------------------------
# rice (adaptive k via EMA, limited quotient with escape)
# ---------------------------------------------------------------------------

def _rice_models(L, W):
    # [0..GU-1] unary, [GU..GU+W-1] escape bits, then mantissa models
    # keyed by (ctx, bit index) with ctx = bitlen(q+1) in [0, W]
    GU = _rice_qslots(W)
    return slotted.ModelTable(L, GU + W + (W + 1) * W)


def _rice_qslots(W):
    # worst-case unary length: qmax + bitlen(qmax escape) + stop bit
    return RICEMAX + W + 2


def _rice_k(ema, W):
    """Adaptive Rice parameter: RICEK(ema) = bsr32(ema+1) (rcutil_.h:127)."""
    return jnp.clip(slotted.bitlen(ema + ema.dtype.type(1),
                                   W).astype(jnp.int32) - 1, 0, W - 1)


def _rice_enc(rec, m, v, ema, W):
    GU = _rice_qslots(W)
    k = _rice_k(ema, W)
    q = v >> k.astype(v.dtype)
    esc = q > RICEMAX
    qx = jnp.where(esc, q - v.dtype.type(RICEMAX), v.dtype.type(1))
    qb = slotted.bitlen(qx, W).astype(jnp.int32)
    ulen = jnp.where(esc, RICEMAX + qb,
                     jnp.minimum(q, v.dtype.type(RICEMAX)).astype(jnp.int32))
    for u in range(_rice_qslots(W)):
        rec.code(m, _idx(v, u), u == ulen, u <= ulen)
    for j in range(W - 1):  # escape payload: qb-1 bits of qx (msb dropped)
        a = esc & (j < qb - 1)
        gi = jnp.where(a, qb - 2 - j, 0)
        rec.code(m, GU + gi, (qx >> gi.astype(v.dtype)) & v.dtype.type(1), a)
    ctx = slotted.bitlen(q + v.dtype.type(1), W).astype(jnp.int32)
    for j in range(W):  # k low bits of v
        a = j < k
        gi = jnp.where(a, k - 1 - j, 0)
        rec.code(m, GU + W + ctx * W + gi,
                 (v >> gi.astype(v.dtype)) & v.dtype.type(1), a)
    ema = (v.dtype.type(63) * ema + v + v.dtype.type(16)) >> v.dtype.type(6)
    return ema  # EMA(6, ema, 63, x), rcutil_.h:126


def _rice_dec(dec, m, ema, W, like):
    GU = _rice_qslots(W)
    k = _rice_k(ema, W)
    ufin = jnp.zeros(like.shape, jnp.bool_)
    ulen = jnp.zeros(like.shape, jnp.int32)
    for u in range(_rice_qslots(W)):
        a = ~ufin
        bit = dec.read(m, _idx(like, u), a)
        ufin = ufin | bit
        ulen = ulen + (a & ~bit).astype(jnp.int32)
    esc = ulen > RICEMAX
    qb = jnp.where(esc, ulen - RICEMAX, 0)
    qx = jnp.ones(like.shape, like.dtype)
    for j in range(W - 1):
        a = esc & (j < qb - 1)
        gi = jnp.where(a, qb - 2 - j, 0)
        bit = dec.read(m, GU + gi, a)
        qx = jnp.where(a, (qx << 1) | bit.astype(like.dtype), qx)
    q = jnp.where(esc, qx + like.dtype.type(RICEMAX),
                  ulen.astype(like.dtype))
    ctx = slotted.bitlen(q + like.dtype.type(1), W).astype(jnp.int32)
    v = q << k.astype(like.dtype)
    for j in range(W):
        a = j < k
        gi = jnp.where(a, k - 1 - j, 0)
        bit = dec.read(m, GU + W + ctx * W + gi, a)
        v = jnp.where(a, v | (bit.astype(like.dtype)
                              << gi.astype(like.dtype)), v)
    ema = (like.dtype.type(63) * ema + v + like.dtype.type(16)) \
        >> like.dtype.type(6)
    return v, ema


# ---------------------------------------------------------------------------
# u3 segmented varint: 0 / 01xxx / 000xxxxx / 001xxxxxxxx (mb_vint.h:235)
# ---------------------------------------------------------------------------

_U3 = (3, 5, 8)          # segment payload bits
_U3_BASE = (1, 9, 41)    # value range starts (0 alone in segment -1)


def _u3_models(L):
    # flags [0..2], then tree models per segment (2^nb slots each)
    n = 3
    offs = []
    for nb in _U3:
        offs.append(n)
        n += 1 << nb
    return slotted.ModelTable(L, n), tuple(offs)


def _u3_seg(v):
    s0 = v == 0
    s1 = (v >= 1) & (v < 9)
    s2 = (v >= 9) & (v < 41)
    # segment index: -1 for zero, else 0/1/2
    return s0, jnp.where(s1, 0, jnp.where(s2, 1, 2))


def _u3_enc(rec, m, offs, v):
    one = jnp.ones_like(v, jnp.bool_)
    s0, seg = _u3_seg(v)
    # flags: f0 = (v==0); else f1 = (seg==0); else f2 = (seg==2)
    rec.code(m, jnp.zeros_like(v), s0, one)
    rec.code(m, jnp.ones_like(v), seg == 0, ~s0)
    rec.code(m, jnp.full_like(v, 2), seg == 2, ~s0 & (seg != 0))
    base = jnp.where(seg == 0, _U3_BASE[0],
                     jnp.where(seg == 1, _U3_BASE[1], _U3_BASE[2]))
    off = jnp.where(seg == 0, offs[0],
                    jnp.where(seg == 1, offs[1], offs[2]))
    x = v - base
    for si, nb in enumerate(_U3):
        node = jnp.ones_like(v)
        for i in range(nb - 1, -1, -1):
            a = ~s0 & (seg == si)
            bit = (x >> i) & 1
            rec.code(m, off + node, bit, a)
            node = (node << 1) | bit
    return


def _u3_dec(dec, m, offs, like):
    one = jnp.ones_like(like, jnp.bool_)
    f0 = dec.read(m, jnp.zeros_like(like), one)
    f1 = dec.read(m, jnp.ones_like(like), ~f0)
    f2 = dec.read(m, jnp.full_like(like, 2), ~f0 & ~f1)
    seg = jnp.where(f1, 0, jnp.where(f2, 2, 1))
    x = jnp.zeros_like(like)
    for si, nb in enumerate(_U3):
        a = ~f0 & (seg == si)
        node = jnp.ones_like(like)
        for i in range(nb - 1, -1, -1):
            bit = dec.read(m, offs[si] + node, a)
            node = jnp.where(a, (node << 1) | bit.astype(like.dtype), node)
        x = jnp.where(a, node - (1 << nb), x)
    base = jnp.where(seg == 0, _U3_BASE[0],
                     jnp.where(seg == 1, _U3_BASE[1], _U3_BASE[2]))
    return jnp.where(f0, 0, x + base)


# ---------------------------------------------------------------------------
# device scans + block API
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "kind", "W"))
def encode_device(block: jnp.ndarray, K: int, kind: str, W: int = 8):
    L = block.shape[0]
    cols = block.T  # [K, L]
    if kind in ("gamma", "vlc"):
        m0 = _gamma_models(L, W)
        nslots = 2 * W
        raw = kind == "vlc"

        def body(carry, v):
            m = slotted.ModelTable.from_state(carry)
            rec = slotted.Recorder()
            _gamma_enc(rec, m, v, W, raw_mantissa=raw)
            return m.t, rec.slots()

        init = m0.t
    elif kind == "rice":
        m0 = _rice_models(L, W)
        nslots = _slots_per_elem(kind, W)

        def body(carry, v):
            t, ema = carry
            m = slotted.ModelTable.from_state(t)
            rec = slotted.Recorder()
            ema = _rice_enc(rec, m, v, ema, W)
            return (m.t, ema), rec.slots()

        init = (m0.t, jnp.zeros((L,), jnp.uint32))
    elif kind == "u3":
        m0, offs = _u3_models(L)
        nslots = 3 + sum(_U3)

        def body(carry, v):
            m = slotted.ModelTable.from_state(carry)
            rec = slotted.Recorder()
            _u3_enc(rec, m, offs, v)
            return m.t, rec.slots()

        init = m0.t
    else:
        raise ValueError(kind)

    _, (probs, bits, valids) = jax.lax.scan(body, init, cols)
    S = K * nslots
    lows, freqs = binary.to_low_freq(probs.reshape(S, L),
                                     bits.reshape(S, L))
    words, emit, st = rans.encode_backward(lows, freqs, valids.reshape(S, L))
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "kind", "W"))
def decode_device(streams: jnp.ndarray, K: int, kind: str, W: int = 8):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    like = jnp.zeros((L,), jnp.uint32)

    if kind in ("gamma", "vlc"):
        m0 = _gamma_models(L, W)
        raw = kind == "vlc"

        def body(carry, _):
            t, state, pos = carry
            m = slotted.ModelTable.from_state(t)
            dec = slotted.Decoder(state, pos, streams)
            v = _gamma_dec(dec, m, W, like, raw_mantissa=raw)
            state, pos = dec.carry()
            return (m.t, state, pos), v

        init = (m0.t, state, pos)
    elif kind == "rice":
        m0 = _rice_models(L, W)

        def body(carry, _):
            t, ema, state, pos = carry
            m = slotted.ModelTable.from_state(t)
            dec = slotted.Decoder(state, pos, streams)
            v, ema = _rice_dec(dec, m, ema, W, like)
            state, pos = dec.carry()
            return (m.t, ema, state, pos), v

        init = (m0.t, jnp.zeros((L,), jnp.uint32), state, pos)
    elif kind == "u3":
        m0, offs = _u3_models(L)

        def body(carry, _):
            t, state, pos = carry
            m = slotted.ModelTable.from_state(t)
            dec = slotted.Decoder(state, pos, streams)
            v = _u3_dec(dec, m, offs, like)
            state, pos = dec.carry()
            return (m.t, state, pos), v

        init = (m0.t, state, pos)
    else:
        raise ValueError(kind)

    _, vals = jax.lax.scan(body, init, None, length=K)
    return vals.T  # [L, K]


def _slots_per_elem(kind, W):
    if kind in ("gamma", "vlc"):
        return 2 * W
    if kind == "rice":
        return _rice_qslots(W) + (W - 1) + W
    if kind == "u3":
        return 3 + sum(_U3)
    raise ValueError(kind)


def make_block_api(kind: str, esize: int = 1):
    """Build (encode_block, decode_block) for an integer codec.

    esize: element width in bytes (1 or 2); multi-byte elements are
    little-endian in the byte stream.
    """
    W = 8 * esize

    def encode_block(data: np.ndarray, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> bytes:
        elems = _to_elems(data, esize)
        block, K = blockio.shape_block_elems(elems, lanes, step_quant,
                                         dtype=np.uint32)
        streams, lengths = encode_device(jnp.asarray(block), K, kind, W)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> np.ndarray:
        n_elems = -(-n // esize)
        K = blockio.K_for(n_elems, lanes, step_quant)
        M = _slots_per_elem(kind, W) * K + 2
        streams = blockio.unpack_device(payload, lanes, M)
        vals = np.asarray(decode_device(streams, K, kind, W))
        return _from_elems(vals.reshape(-1)[:n_elems], esize)[:n]

    return encode_block, decode_block


def _to_elems(data: np.ndarray, esize: int) -> np.ndarray:
    if esize == 1:
        return data.astype(np.uint32)
    pad = (-data.shape[0]) % esize
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    return data.view(f"<u{esize}").astype(np.uint32)


def _from_elems(vals: np.ndarray, esize: int) -> np.ndarray:
    if esize == 1:
        return vals.astype(np.uint8)
    return vals.astype(f"<u{esize}").view(np.uint8)
