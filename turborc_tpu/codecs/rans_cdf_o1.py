"""Adaptive-CDF rANS, order-1 (reference `anscdf1` / mnenc8x2x,
anscdf.c:607-645 + anscdf_.h:121-126/164-174, bench id 64).

Byte context = previous byte: 256 hi-nibble CDF16s and 256x16 lo-nibble
CDF16s per lane.  The per-lane model is large (256*17*16 u16-class cells),
so this codec favors fewer, longer lanes; model rows are accessed with
take_along_axis gathers on a flat [L, ctx*16] table (XLA path only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans


def _row_get(table: jnp.ndarray, row: jnp.ndarray) -> jnp.ndarray:
    """table [L, R, 16], row [L] -> [L, 16]."""
    return jnp.take_along_axis(table, row[:, None, None], axis=1)[:, 0]


def _row_put(table: jnp.ndarray, row: jnp.ndarray, val: jnp.ndarray):
    return table.at[jnp.arange(table.shape[0]), row].set(val)


def _model_init(L: int):
    hi = cdf16.init((L, 256))        # [L, 256 ctx, 16]
    lo = cdf16.init((L, 256 * 16))   # [L, ctx*16 rows, 16]
    return hi, lo


@functools.partial(jax.jit, static_argnames=("K",))
def encode_device(block: jnp.ndarray, K: int):
    L = block.shape[0]
    cols = block.T

    def fwd(carry, b):
        hi_t, lo_t, cx = carry
        hi, lo = b >> 4, b & 15
        hrow = _row_get(hi_t, cx)
        low_h, fr_h = cdf16.lookup(hrow, hi)
        hi_t = _row_put(hi_t, cx, cdf16.update(hrow, low_h))
        lrow_i = cx * 16 + hi
        lrow = _row_get(lo_t, lrow_i)
        low_l, fr_l = cdf16.lookup(lrow, lo)
        lo_t = _row_put(lo_t, lrow_i, cdf16.update(lrow, low_l))
        return (hi_t, lo_t, b), (low_h, fr_h, low_l, fr_l)

    init = _model_init(L) + (jnp.zeros((L,), jnp.int32),)
    _, (low_h, fr_h, low_l, fr_l) = jax.lax.scan(fwd, init, cols)
    lows = jnp.stack([low_h, low_l], axis=1).reshape(2 * K, L)
    freqs = jnp.stack([fr_h, fr_l], axis=1).reshape(2 * K, L)
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_device(streams: jnp.ndarray, K: int):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)

    def dec(carry, _):
        hi_t, lo_t, cx, state, pos = carry
        hrow = _row_get(hi_t, cx)
        value = (state & rans.MASK15).astype(jnp.int32)
        hi, low_h, fr_h = cdf16.search(hrow, value)
        state = rans.dec_update(state, low_h, fr_h)
        hi_t = _row_put(hi_t, cx, cdf16.update(hrow, low_h))
        state, pos = rans.dec_renorm(state, streams, pos)

        lrow_i = cx * 16 + hi
        lrow = _row_get(lo_t, lrow_i)
        value = (state & rans.MASK15).astype(jnp.int32)
        lo, low_l, fr_l = cdf16.search(lrow, value)
        state = rans.dec_update(state, low_l, fr_l)
        lo_t = _row_put(lo_t, lrow_i, cdf16.update(lrow, low_l))
        state, pos = rans.dec_renorm(state, streams, pos)
        b = (hi << 4) | lo
        return (hi_t, lo_t, b, state, pos), b

    init = _model_init(L) + (jnp.zeros((L,), jnp.int32), state, pos)
    _, bytes_t = jax.lax.scan(dec, init, None, length=K)
    return bytes_t.T


def encode_block(data: np.ndarray, lanes: int = 64, step_quant: int = 256,
                 **_unused) -> bytes:
    lanes = min(lanes, 128)  # per-lane o1 model is ~256KB of state
    block, K = blockio.shape_block(data, lanes, step_quant)
    streams, lengths = encode_device(blockio.push_u8(block), K)
    return blockio.pack_device(streams, lengths)


def decode_block(payload: bytes, n: int, lanes: int = 64,
                 step_quant: int = 256, **_unused) -> np.ndarray:
    lanes = min(lanes, 128)
    K = blockio.K_for(n, lanes, step_quant)
    streams = blockio.unpack_device(payload, lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_device(streams, K))
    return block.reshape(-1)[:n]
