"""`rcv-2e` (id 9): Turbo-VLC with a genuine TWO-ENDED lane stream.

The reference's rcv coders interleave two streams in one buffer: the
range-coder stream (adaptive exponents) grows forward while raw mantissa
bits grow backward from the end (rc_.c:1026 `biteinir(bw,br,op_)` with
op_ = buffer end; bit I/O rcutil_.h:166-190).  The boundary between the
two is never stored - each reader starts at its own end.

This codec carries that capability into the lane-parallel design: each
lane's row is

    [ rANS u16 stream  -> ...          ... <- R->L mantissa bits ]

with ONE length per lane and no inner boundary field.  The exponent
stage is an adaptive CDF16 over s = bitlen(x >> 3) (the repo's standard
VLC split, rans_vlc.py); mantissas are unmodeled bits in the R->L
stream (ops/bitio.py) exactly like the reference's bitput side.  A
single zero byte may pad the middle when the two ends' lengths have
opposite parity (u16 alignment of the left end).

16-bit elements (reference rcv id 30 class).  Like the other scan
codecs this is a capability row, not the fast path.
"""
from __future__ import annotations

import functools

import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16 as _cdf16
from turborc_tpu.ops import bitio, rans


def _split_host(x: np.ndarray):
    """x u16 -> (exponent s, mantissa, mantissa bit count).  s=0: x<8,
    3 raw bits; else x in [2^(s+2), 2^(s+3)), s+2 bits, leading 1
    dropped (same scheme as rans_vlc)."""
    x = x.astype(np.uint32)
    bl = np.zeros_like(x)
    v = x >> 3
    for _ in range(13):
        bl = np.where(v > 0, bl + 1, bl)
        v >>= 1
    s = bl
    nb = np.where(s == 0, 3, s + 2).astype(np.int64)
    mant = np.where(s == 0, x, x - (np.uint32(1) << (s + 2).astype(np.uint32)))
    return s.astype(np.int32), mant.astype(np.uint32), nb


def _join_host(s: np.ndarray, mant: np.ndarray) -> np.ndarray:
    s = s.astype(np.uint32)
    return np.where(s == 0, mant,
                    mant + (np.uint32(1) << (s + 2))).astype(np.uint32)


def _jits():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("K",))
    def enc_syms(syms, K):  # [L, K] 4-bit symbols -> streams, lengths
        def fwd(cdf, col):
            low, freq = _cdf16.lookup(cdf, col)
            return _cdf16.update(cdf, low), (low, freq)

        _, (lows, freqs) = jax.lax.scan(fwd, _cdf16.init((syms.shape[0],)),
                                        syms.T)
        words, emit, st = rans.encode_backward(lows, freqs)
        return rans.stitch(words, emit, st)

    @functools.partial(jax.jit, static_argnames=("K",))
    def dec_syms(streams, K):  # [L, M] -> [L, K] symbols
        state, pos = rans.dec_init(streams)

        def dec(carry, _):
            cdf, state, pos = carry
            value = (state & rans.MASK15).astype(jnp.int32)
            sym, low, freq = _cdf16.search(cdf, value)
            state = rans.dec_update(state, low, freq)
            state, pos = rans.dec_renorm(state, streams, pos)
            return (_cdf16.update(cdf, low), state, pos), sym

        _, syms = jax.lax.scan(
            dec, (_cdf16.init((streams.shape[0],)), state, pos), None,
            length=K)
        return syms.T

    return enc_syms, dec_syms


def encode_block(data: np.ndarray, lanes: int = 64,
                 step_quant: int = 64, **_unused) -> bytes:
    data = np.asarray(data, np.uint8)
    buf = data.tobytes() + b"\0" * (data.shape[0] % 2)
    elems = np.frombuffer(buf, "<u2")
    block, K = blockio.shape_block_elems(elems, lanes, step_quant)
    s, mant, nb = _split_host(block)
    enc_syms, _ = _jits()
    import jax.numpy as jnp
    streams, lengths = enc_syms(jnp.asarray(s), K)
    streams = np.asarray(streams)
    lengths = np.asarray(lengths)
    rows = []
    for i in range(lanes):
        left = streams[i, : lengths[i]].astype("<u2").tobytes()
        right = bitio.pack_r2l(mant[i], nb[i])
        pad = b"\0" * ((len(left) + len(right)) % 2 == 1)
        rows.append(left + pad + right)
    lens = np.array([len(r) for r in rows], np.int64)
    if lens.max() > 0xFFFF:
        raise ValueError("lane row exceeds u16 length field")
    return lens.astype("<u2").tobytes() + b"".join(rows)


def decode_block(payload: bytes, n: int, lanes: int = 64,
                 step_quant: int = 64, **_unused) -> np.ndarray:
    n_elems = -(-n // 2)
    K = blockio.K_for(n_elems, lanes, step_quant)
    if len(payload) < 2 * lanes:
        raise ValueError("corrupt payload: truncated 2e length table")
    lens = np.frombuffer(payload[: 2 * lanes], "<u2").astype(np.int64)
    body = payload[2 * lanes:]
    if lens.sum() != len(body):
        raise ValueError("corrupt payload: 2e length table inconsistent")
    offs = np.concatenate([[0], np.cumsum(lens)])
    rows = [body[offs[i]: offs[i + 1]] for i in range(lanes)]
    # left end: u16 word matrix (rows may include mantissa tail bytes -
    # the exponent decoder stops before reaching them)
    M = max(2, int(lens.max()) // 2)
    streams = np.zeros((lanes, M), np.int32)
    for i, r in enumerate(rows):
        w = np.frombuffer(r[: len(r) & ~1], "<u2")
        streams[i, : w.shape[0]] = w
    _, dec_syms = _jits()
    import jax.numpy as jnp
    s = np.asarray(dec_syms(jnp.asarray(streams), K))
    nb = np.where(s == 0, 3, s + 2).astype(np.int64)
    out = np.zeros((lanes, K), np.uint32)
    for i, r in enumerate(rows):
        mant = bitio.unpack_r2l(r, nb[i])
        out[i] = _join_host(s[i], mant)
    flat = out.reshape(-1)[:n_elems].astype("<u2").tobytes()
    return np.frombuffer(flat, np.uint8)[:n].copy()
