"""4-bit symbol codecs: adaptive (rc4) and static (rc4c / ans static nibble).

Reference counterparts: rc4/rc4c (rc_.c:141-176, bench ids 40/41) and the
static-CDF nibble rANS (anscdf.c:57-85, id 65).  Input bytes are split into
a nibble stream (hi, lo, hi, lo ...); every nibble is one 4-bit symbol:

  adaptive: one per-lane CDF16 adapting over the whole nibble stream -
            the pure 4-bit-alphabet codec (for nibble-packed data the
            byte-oriented flagship would misattribute context)
  static:   one shared CDF16 built from the block's nibble histogram on
            the host (cdfini semantics, rccdf.c:50-68); the table costs
            32 bytes of payload and decode needs no model state at all
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans

RC_BITS = 15
TOTAL = 1 << RC_BITS


def _to_nibbles(block: jnp.ndarray) -> jnp.ndarray:
    """[L, K] bytes -> [2K, L] nibble stream (time major)."""
    cols = block.T
    return jnp.stack([cols >> 4, cols & 15], axis=1).reshape(
        2 * cols.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("K",))
def encode_adaptive(block: jnp.ndarray, K: int):
    L = block.shape[0]
    nibs = _to_nibbles(block)

    def fwd(cdf, s):
        low, freq = cdf16.lookup(cdf, s)
        return cdf16.update(cdf, low), (low, freq)

    _, (lows, freqs) = jax.lax.scan(fwd, cdf16.init((L,)), nibs)
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_adaptive(streams: jnp.ndarray, K: int):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)

    def dec(carry, _):
        cdf, state, pos = carry
        value = (state & rans.MASK15).astype(jnp.int32)
        sym, low, freq = cdf16.search(cdf, value)
        state = rans.dec_update(state, low, freq)
        state, pos = rans.dec_renorm(state, streams, pos)
        return (cdf16.update(cdf, low), state, pos), sym

    _, nibs = jax.lax.scan(dec, (cdf16.init((L,)), state, pos), None,
                           length=2 * K)
    hilo = nibs.reshape(K, 2, L)
    return ((hilo[:, 0] << 4) | hilo[:, 1]).T


@functools.partial(jax.jit, static_argnames=("K",))
def encode_static(block: jnp.ndarray, cdf17: jnp.ndarray, K: int):
    nibs = _to_nibbles(block)
    lows_tab = cdf17[:-1]
    freqs_tab = cdf17[1:] - cdf17[:-1]
    words, emit, st = rans.encode_backward(lows_tab[nibs], freqs_tab[nibs])
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_static(streams: jnp.ndarray, cdf17: jnp.ndarray, K: int):
    state, pos = rans.dec_init(streams)
    cdf16_tab = cdf17[:-1]

    def dec(carry, _):
        state, pos = carry
        value = (state & rans.MASK15).astype(jnp.int32)
        gt = cdf16_tab[None, :] > value[:, None]
        sym = 15 - jnp.sum(gt.astype(jnp.int32), axis=-1)
        low = cdf17[sym]
        freq = cdf17[sym + 1] - low
        state = rans.dec_update(state, low, freq)
        state, pos = rans.dec_renorm(state, streams, pos)
        return (state, pos), sym

    _, nibs = jax.lax.scan(dec, (state, pos), None, length=2 * K)
    hilo = nibs.reshape(K, 2, -1)
    return ((hilo[:, 0] << 4) | hilo[:, 1]).T


def _build_nibble_freqs(data: np.ndarray) -> np.ndarray:
    """Nibble histogram -> freq table summing 2^15, freq>=1 everywhere
    (padding nibbles are 0, so every symbol must stay codeable)."""
    h = np.bincount(np.concatenate([data >> 4, data & 15]),
                    minlength=16).astype(np.int64) + 1
    n = h.sum()
    f = np.maximum(1, h * (TOTAL - 16) // n)
    f[np.argmax(h)] += TOTAL - f.sum()
    assert f.sum() == TOTAL and (f >= 1).all()
    return f.astype(np.uint16)


def encode_block(data: np.ndarray, lanes: int = 512, step_quant: int = 256,
                 **_unused) -> bytes:
    block, K = blockio.shape_block(data, lanes, step_quant)
    streams, lengths = encode_adaptive(blockio.push_u8(block), K)
    return blockio.pack_device(streams, lengths)


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> np.ndarray:
    K = blockio.K_for(n, lanes, step_quant)
    streams = blockio.unpack_device(payload, lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_adaptive(streams, K))
    return block.reshape(-1)[:n]


def encode_block_static(data: np.ndarray, lanes: int = 512,
                        step_quant: int = 256, **_unused) -> bytes:
    freqs = _build_nibble_freqs(data)
    cdf = np.zeros(17, np.int32)
    np.cumsum(freqs, out=cdf[1:])
    block, K = blockio.shape_block(data, lanes, step_quant)
    streams, lengths = encode_static(blockio.push_u8(block),
                                     jnp.asarray(cdf), K)
    return freqs.astype("<u2").tobytes() + blockio.pack_device(
        streams, lengths)


def decode_block_static(payload: bytes, n: int, lanes: int = 512,
                        step_quant: int = 256, **_unused) -> np.ndarray:
    K = blockio.K_for(n, lanes, step_quant)
    freqs = np.frombuffer(payload[:32], "<u2").astype(np.int64)
    if freqs.sum() != TOTAL:
        raise ValueError("corrupt payload: bad static nibble CDF")
    cdf = np.zeros(17, np.int32)
    np.cumsum(freqs, out=cdf[1:])
    streams = blockio.unpack_device(payload[32:], lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_static(streams, jnp.asarray(cdf), K))
    return block.reshape(-1)[:n]
