"""Run-length + entropy codecs (reference rcrle/rcrle1, rc_.c:846-988).

Per lane: literals are coded with a byte tree model (order-0 for rcrle,
order-1 for rcrle1); whenever a byte repeats its predecessor, the remaining
run length is gamma-coded and those positions are skipped.  rcrle1
additionally keys the run-length models by a per-symbol run-history EMA
bucket (the reference's HISTPRED/HISTUPD context, rc_.c:924-926).
Encoding precomputes the look-ahead run length per position with a reverse
scan; both scans are fixed-shape with masked slots, so lanes with
different run structure stay in lockstep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.codecs.intcodecs import _gamma_enc, _gamma_dec
from turborc_tpu.ops import binary, rans, slotted

RUN_W = 14  # gamma width for run lengths; requires K <= 2^RUN_W
_NLIT = 256
_NGAMMA = 1 + RUN_W + RUN_W * RUN_W
_NHIST = 8  # run-history context buckets (rcrle1, rc_.c:924-926)


def _models(L, order1: bool = False):
    # literal tree (o0: 256 nodes; o1: 256 ctx x 256 nodes), then gamma
    # run models (o0: one bank; o1: _NHIST banks keyed by the per-symbol
    # run-length EMA bucket - the reference's HISTPRED/HISTUPD context)
    if order1:
        return slotted.ModelTable(L, 256 * 256 + _NHIST * _NGAMMA)
    return slotted.ModelTable(L, _NLIT + _NGAMMA)


def _hist_bucket(ema):
    return jnp.clip(slotted.bitlen(ema, 16), 0, _NHIST - 1)


class _OffsetModel:
    """View of a ModelTable with an index offset (shares the table)."""

    def __init__(self, base: slotted.ModelTable, off: int):
        self.base = base
        self.off = off

    def predict(self, idx):
        return self.base.predict(idx + self.off)

    def update(self, idx, p, bit, active):
        self.base.update(idx + self.off, p, bit, active)


def _code_literal(rec, m, b, active):
    node = jnp.ones_like(b)
    for i in range(7, -1, -1):
        bit = (b >> i) & 1
        rec.code(m, node, bit, active)
        node = (node << 1) | bit


def _dec_literal(dec, m, active, like):
    node = jnp.ones_like(like)
    for _ in range(8):
        bit = dec.read(m, node, active)
        node = jnp.where(active, (node << 1) | bit.astype(like.dtype), node)
    return node & 0xFF


def _lit_model(m, prev, order1):
    if not order1:
        return m
    return _OffsetModel(m, jnp.maximum(prev, 0) * 256)


def _run_model(m, hist, b, order1):
    """Run-length gamma bank (+ its hist row for the EMA update)."""
    if not order1:
        return _OffsetModel(m, _NLIT), None
    ema = jnp.take_along_axis(hist, b[:, None], axis=1)[:, 0]
    off = 256 * 256 + _hist_bucket(ema) * _NGAMMA
    return _OffsetModel(m, off), ema


@functools.partial(jax.jit, static_argnames=("K", "order1"))
def encode_device(block: jnp.ndarray, K: int, order1: bool = False):
    L = block.shape[0]
    cols = block.T  # [K, L]

    # look-ahead run lengths: r[t] = #following positions equal to b[t]
    eq = jnp.concatenate([cols[1:] == cols[:-1],
                          jnp.zeros((1, L), jnp.bool_)], 0)

    def rscan(nxt, e):
        cur = jnp.where(e, nxt + 1, 0)
        return cur, cur

    _, runs = jax.lax.scan(rscan, jnp.zeros((L,), jnp.int32), eq,
                           reverse=True)

    def body(carry, inp):
        t, prev, skip, hist = carry
        b, r = inp
        m = slotted.ModelTable.from_state(t)
        rec = slotted.Recorder()
        act = skip == 0
        _code_literal(rec, _lit_model(m, prev, order1), b, act)
        rep = act & (b == prev)
        rm, ema = _run_model(m, hist, b, order1)
        _gamma_enc(rec, rm, jnp.where(rep, r, 0), RUN_W, active=rep)
        if order1:
            new_ema = (3 * ema + r) >> 2
            hist = hist.at[jnp.arange(L, dtype=jnp.int32), b].set(
                jnp.where(rep, new_ema, ema))
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, b, prev)
        return (m.t, prev, skip, hist), rec.slots()

    init = (_models(L, order1).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L, 256), jnp.int32))
    _, (probs, bits, valids) = jax.lax.scan(body, init, (cols, runs))
    S = probs.shape[0] * probs.shape[1]
    lows, freqs = binary.to_low_freq(probs.reshape(S, L),
                                     bits.reshape(S, L))
    words, emit, st = rans.encode_backward(lows, freqs, valids.reshape(S, L))
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "order1"))
def decode_device(streams: jnp.ndarray, K: int, order1: bool = False):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    like = jnp.zeros((L,), jnp.int32)

    def body(carry, _):
        t, prev, skip, hist, cur, state, pos = carry
        m = slotted.ModelTable.from_state(t)
        dec = slotted.Decoder(state, pos, streams)
        act = skip == 0
        byte = _dec_literal(dec, _lit_model(m, prev, order1), act, like)
        out = jnp.where(act, byte, cur)
        rep = act & (byte == prev)
        rm, ema = _run_model(m, hist, byte, order1)
        r = _gamma_dec(dec, rm, RUN_W, like, active=rep)
        if order1:
            new_ema = (3 * ema + r) >> 2
            hist = hist.at[jnp.arange(L, dtype=jnp.int32), byte].set(
                jnp.where(rep, new_ema, ema))
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, byte, prev)
        state, pos = dec.carry()
        return (m.t, prev, skip, hist, out, state, pos), out

    init = (_models(L, order1).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L, 256), jnp.int32),
            jnp.zeros((L,), jnp.int32), state, pos)
    _, vals = jax.lax.scan(body, init, None, length=K)
    return vals.T


def make_block_api(order1: bool = False):
    def encode_block(data: np.ndarray, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> bytes:
        block, K = blockio.shape_block(data, lanes, step_quant)
        if K > (1 << RUN_W):
            raise ValueError("rle: K exceeds run-length gamma range")
        streams, lengths = encode_device(blockio.push_u8(block), K, order1)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> np.ndarray:
        K = blockio.K_for(n, lanes, step_quant)
        M = (8 + 1 + 2 * RUN_W) * K + 2
        streams = blockio.unpack_device(payload, lanes, M)
        block = blockio.fetch_u8(decode_device(streams, K, order1))
        return block.reshape(-1)[:n]

    return encode_block, decode_block


encode_block, decode_block = make_block_api(order1=False)
encode_block_o1, decode_block_o1 = make_block_api(order1=True)


# ---------------------------------------------------------------------------
# 16-bit symbol variants (reference rcrle/rcrle1 enc16/dec16,
# rc_.c:880-988): run heads are u16 elements, coded hi byte then lo byte
# (lo tree keyed by hi, the reference's mb0[cx]); run lengths are
# gamma-coded under a hi-byte context (rcrle-16) or a run-history EMA
# bucket per hi byte (rcrle1-16; the reference keys its zero-flag by the
# full u16 symbol, 1<<16 models - per-lane tables that wide exceed HBM,
# so the hi byte carries the context role here).
# ---------------------------------------------------------------------------

_N16_LO = 256 * 256


def _models16(L, order1: bool):
    if order1:
        # hi|prev-hi trees, lo|hi trees, runs by history bucket
        n = 256 * 256 + _N16_LO + _NHIST * _NGAMMA
    else:
        # hi tree, lo|hi trees, runs by hi byte
        n = 256 + _N16_LO + 256 * _NGAMMA
    return slotted.ModelTable(L, n)


def _lit16_offs(order1: bool):
    lo_base = 256 * 256 if order1 else 256
    return lo_base, lo_base + _N16_LO


def _run16_model(m, hist, hi, run_base, order1):
    if not order1:
        return _OffsetModel(m, run_base + hi * _NGAMMA), None
    ema = jnp.take_along_axis(hist, hi[:, None], axis=1)[:, 0]
    return _OffsetModel(m, run_base + _hist_bucket(ema) * _NGAMMA), ema


@functools.partial(jax.jit, static_argnames=("K", "order1"))
def encode_device16(block: jnp.ndarray, K: int, order1: bool = False):
    L = block.shape[0]
    cols = block.T  # [K, L] u16 elements as int32
    eq = jnp.concatenate([cols[1:] == cols[:-1],
                          jnp.zeros((1, L), jnp.bool_)], 0)

    def rscan(nxt, e):
        cur = jnp.where(e, nxt + 1, 0)
        return cur, cur

    _, runs = jax.lax.scan(rscan, jnp.zeros((L,), jnp.int32), eq,
                           reverse=True)
    lo_base, run_base = _lit16_offs(order1)

    def body(carry, inp):
        t, prev, skip, hist = carry
        b, r = inp
        m = slotted.ModelTable.from_state(t)
        rec = slotted.Recorder()
        act = skip == 0
        hi, lo = b >> 8, b & 0xFF
        hi_m = (_OffsetModel(m, (jnp.maximum(prev, 0) >> 8) * 256)
                if order1 else m)
        _code_literal(rec, hi_m, hi, act)
        _code_literal(rec, _OffsetModel(m, lo_base + hi * 256), lo, act)
        rep = act & (b == prev)
        rm, ema = _run16_model(m, hist, hi, run_base, order1)
        _gamma_enc(rec, rm, jnp.where(rep, r, 0), RUN_W, active=rep)
        if order1:
            new_ema = (3 * ema + r) >> 2
            hist = hist.at[jnp.arange(L, dtype=jnp.int32), hi].set(
                jnp.where(rep, new_ema, ema))
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, b, prev)
        return (m.t, prev, skip, hist), rec.slots()

    init = (_models16(L, order1).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L, 256), jnp.int32))
    _, (probs, bits, valids) = jax.lax.scan(body, init, (cols, runs))
    S = probs.shape[0] * probs.shape[1]
    lows, freqs = binary.to_low_freq(probs.reshape(S, L),
                                     bits.reshape(S, L))
    words, emit, st = rans.encode_backward(lows, freqs, valids.reshape(S, L))
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "order1"))
def decode_device16(streams: jnp.ndarray, K: int, order1: bool = False):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    like = jnp.zeros((L,), jnp.int32)
    lo_base, run_base = _lit16_offs(order1)

    def body(carry, _):
        t, prev, skip, hist, cur, state, pos = carry
        m = slotted.ModelTable.from_state(t)
        dec = slotted.Decoder(state, pos, streams)
        act = skip == 0
        hi_m = (_OffsetModel(m, (jnp.maximum(prev, 0) >> 8) * 256)
                if order1 else m)
        hi = _dec_literal(dec, hi_m, act, like)
        lo = _dec_literal(dec, _OffsetModel(m, lo_base + hi * 256), act,
                          like)
        elem = (hi << 8) | lo
        out = jnp.where(act, elem, cur)
        rep = act & (elem == prev)
        rm, ema = _run16_model(m, hist, hi, run_base, order1)
        r = _gamma_dec(dec, rm, RUN_W, like, active=rep)
        if order1:
            new_ema = (3 * ema + r) >> 2
            hist = hist.at[jnp.arange(L, dtype=jnp.int32), hi].set(
                jnp.where(rep, new_ema, ema))
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, elem, prev)
        state, pos = dec.carry()
        return (m.t, prev, skip, hist, out, state, pos), out

    init = (_models16(L, order1).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L, 256), jnp.int32),
            jnp.zeros((L,), jnp.int32), state, pos)
    _, vals = jax.lax.scan(body, init, None, length=K)
    return vals.T


def make_block_api16(order1: bool = False):
    # wide per-lane tables (o0-16: ~120k models/lane): clamp lanes so the
    # table stays ~60 MB HBM (same discipline as rcc2, rc_bit.py:203)
    _MAXL = 128

    def encode_block16(data: np.ndarray, lanes: int = 128,
                       step_quant: int = 64, **_unused) -> bytes:
        lanes = min(lanes, _MAXL)
        elems = np.zeros(-(-data.shape[0] // 2) * 2, np.uint8)
        elems[:data.shape[0]] = data
        elems = elems.view("<u2").astype(np.int32)
        block, K = blockio.shape_block_elems(elems, lanes, step_quant)
        if K > (1 << RUN_W):
            raise ValueError("rle16: K exceeds run-length gamma range")
        import jax.numpy as _jnp
        streams, lengths = encode_device16(_jnp.asarray(block), K, order1)
        return blockio.pack_device(streams, lengths)

    def decode_block16(payload: bytes, n: int, lanes: int = 128,
                       step_quant: int = 64, **_unused) -> np.ndarray:
        lanes = min(lanes, _MAXL)
        n_elems = -(-n // 2)
        K = blockio.K_for(n_elems, lanes, step_quant)
        M = (16 + 1 + 2 * RUN_W) * K + 2
        streams = blockio.unpack_device(payload, lanes, M)
        vals = np.asarray(decode_device16(streams, K, order1))
        out = vals.reshape(-1)[:n_elems].astype("<u2").view(np.uint8)
        return out[:n].copy()

    return encode_block16, decode_block16


encode_block16, decode_block16 = make_block_api16(order1=False)
encode_block16_o1, decode_block16_o1 = make_block_api16(order1=True)
