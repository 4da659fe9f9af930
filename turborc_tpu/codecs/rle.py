"""Run-length + entropy codec (reference rcrle, rc_.c:846-926).

Per lane: literals are coded with an order-0 byte tree model; whenever a
byte repeats its predecessor, the remaining run length is gamma-coded and
those positions are skipped.  Encoding precomputes the look-ahead run
length per position with a reverse scan; both scans are fixed-shape with
masked slots, so lanes with different run structure stay in lockstep.
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


def _models(L):
    # [0..255] literal tree, then gamma models for runs
    return slotted.ModelTable(L, _NLIT + _NGAMMA)


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


@functools.partial(jax.jit, static_argnames=("K",))
def encode_device(block: jnp.ndarray, K: int):
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
        t, prev, skip = carry
        b, r = inp
        m = slotted.ModelTable.from_state(t)
        rec = slotted.Recorder()
        act = skip == 0
        _code_literal(rec, m, b, act)
        rep = act & (b == prev)
        _gamma_enc(rec, _OffsetModel(m, _NLIT), jnp.where(rep, r, 0),
                   RUN_W, active=rep)
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, b, prev)
        return (m.t, prev, skip), rec.slots()

    init = (_models(L).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32))
    _, (probs, bits, valids) = jax.lax.scan(body, init, (cols, runs))
    S = probs.shape[0] * probs.shape[1]
    lows, freqs = binary.to_low_freq(probs.reshape(S, L),
                                     bits.reshape(S, L))
    words, emit, st = rans.encode_backward(lows, freqs, valids.reshape(S, L))
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_device(streams: jnp.ndarray, K: int):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    like = jnp.zeros((L,), jnp.int32)

    def body(carry, _):
        t, prev, skip, cur, state, pos = carry
        m = slotted.ModelTable.from_state(t)
        dec = slotted.Decoder(state, pos, streams)
        act = skip == 0
        byte = _dec_literal(dec, m, act, like)
        out = jnp.where(act, byte, cur)
        rep = act & (byte == prev)
        r = _gamma_dec(dec, _OffsetModel(m, _NLIT), RUN_W, like,
                       active=rep)
        skip = jnp.where(act, jnp.where(rep, r, 0), skip - 1)
        prev = jnp.where(act, byte, prev)
        state, pos = dec.carry()
        return (m.t, prev, skip, out, state, pos), out

    init = (_models(L).t, jnp.full((L,), -1, jnp.int32),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L,), jnp.int32),
            state, pos)
    _, vals = jax.lax.scan(body, init, None, length=K)
    return vals.T


def encode_block(data: np.ndarray, lanes: int = 512, step_quant: int = 64,
                 **_unused) -> bytes:
    block, K = blockio.shape_block(data, lanes, step_quant)
    if K > (1 << RUN_W):
        raise ValueError("rle: K exceeds run-length gamma range")
    streams, lengths = encode_device(jnp.asarray(block), K)
    return blockio.pack(np.asarray(streams), np.asarray(lengths))


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 64, **_unused) -> np.ndarray:
    K = blockio.K_for(n, lanes, step_quant)
    M = (8 + 1 + 2 * RUN_W) * K + 2
    streams = blockio.unpack(payload, lanes, M)
    block = np.asarray(decode_device(jnp.asarray(streams), K))
    return block.astype(np.uint8).reshape(-1)[:n]
