"""Adaptive-CDF rANS, order-0, nibble-pair byte model - the flagship codec.

Reference counterpart: `anscdfenc`/`anscdfdec` (anscdf.c:567-605, bench
id 56, 24.81% on enwik8bwt).  A byte is coded as hi nibble from one CDF16
plus lo nibble from one of 16 CDF16s selected by the hi nibble
(anscdf_.h:107-112).

TPU-native re-design: a block of N bytes is reshaped into L lanes x K
contiguous bytes; every lane carries its own adaptive model pair and its
own 32-bit rANS state.  Encode = forward model scan (produces per-symbol
(cdf_low, freq)) + backward coding scan + one cumsum/scatter compaction.
Decode = a single forward scan with the fused search+update of cdf_.h:52-59.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans


def _lo_row(cdf_lo: jnp.ndarray, sel: jnp.ndarray) -> jnp.ndarray:
    """Select each lane's lo-nibble table row: [L,16,16] x [L,16] -> [L,16]."""
    return jnp.sum(cdf_lo * sel[:, :, None], axis=1)


def _lo_put(cdf_lo, sel, row_old, row_new):
    """Write back the updated row (one-hot masked, gather/scatter free)."""
    return cdf_lo + (row_new - row_old)[:, None, :] * sel[:, :, None]


def _model_init(L: int):
    return cdf16.init((L,)), cdf16.init((L, 16))


@functools.partial(jax.jit, static_argnames=("K",))
def encode_device(block: jnp.ndarray, K: int):
    """block [L, K] int32 bytes -> (streams [L, 2K+2] i32, lengths [L])."""
    L = block.shape[0]
    cols = block.T  # [K, L] scan over time

    def fwd(carry, b):
        cdf_hi, cdf_lo = carry
        hi, lo = b >> 4, b & 15
        low_h, fr_h = cdf16.lookup(cdf_hi, hi)
        cdf_hi = cdf16.update(cdf_hi, low_h)
        sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
        row = _lo_row(cdf_lo, sel)
        low_l, fr_l = cdf16.lookup(row, lo)
        cdf_lo = _lo_put(cdf_lo, sel, row, cdf16.update(row, low_l))
        return (cdf_hi, cdf_lo), (low_h, fr_h, low_l, fr_l)

    _, (low_h, fr_h, low_l, fr_l) = jax.lax.scan(fwd, _model_init(L), cols)
    # interleave hi/lo: symbol time s = 2t (hi), 2t+1 (lo)
    lows = jnp.stack([low_h, low_l], axis=1).reshape(2 * K, L)
    freqs = jnp.stack([fr_h, fr_l], axis=1).reshape(2 * K, L)
    words, emit, state = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, state)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_device(streams: jnp.ndarray, K: int):
    """streams [L, 2K+2] int32 words -> block [L, K] int32 bytes."""
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)

    def dec(carry, _):
        cdf_hi, cdf_lo, state, pos = carry
        value = (state & rans.MASK15).astype(jnp.int32)
        hi, low_h, fr_h = cdf16.search(cdf_hi, value)
        state = rans.dec_update(state, low_h, fr_h)
        cdf_hi = cdf16.update(cdf_hi, low_h)
        state, pos = rans.dec_renorm(state, streams, pos)

        sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
        row = _lo_row(cdf_lo, sel)
        value = (state & rans.MASK15).astype(jnp.int32)
        lo, low_l, fr_l = cdf16.search(row, value)
        state = rans.dec_update(state, low_l, fr_l)
        cdf_lo = _lo_put(cdf_lo, sel, row, cdf16.update(row, low_l))
        state, pos = rans.dec_renorm(state, streams, pos)
        return (cdf_hi, cdf_lo, state, pos), (hi << 4) | lo

    cdf_hi, cdf_lo = _model_init(L)
    _, bytes_t = jax.lax.scan(dec, (cdf_hi, cdf_lo, state, pos), None,
                              length=K)
    return bytes_t.T  # [L, K]


# ----------------------------------------------------------------------------
# Host block API (fixed-shape padding, stream packing)
# ----------------------------------------------------------------------------

def _K_for(n: int, lanes: int, step_quant: int) -> int:
    """Per-lane symbol count: ceil(n/lanes) padded to step_quant (>= 1 step)."""
    K = -(-n // lanes)
    return max(-(-K // step_quant) * step_quant, step_quant)


def _shape_block(data: np.ndarray, lanes: int, step_quant: int):
    n = data.shape[0]
    K = _K_for(n, lanes, step_quant)
    padded = np.zeros(lanes * K, np.uint8)
    padded[:n] = data
    return padded.reshape(lanes, K).astype(np.int32), K


def encode_block(data: np.ndarray, lanes: int = 512,
                 step_quant: int = 256) -> bytes:
    """Encode one block -> payload bytes (lane lengths + stitched streams)."""
    block, K = _shape_block(data, lanes, step_quant)
    streams, lengths = encode_device(jnp.asarray(block), K)
    streams = np.asarray(streams)
    lengths = np.asarray(lengths)
    if lengths.max() > 0xFFFF:
        raise ValueError("lane stream exceeds u16 length field")
    keep = np.arange(streams.shape[1])[None, :] < lengths[:, None]
    flat = streams[keep].astype(np.uint16)
    return lengths.astype("<u2").tobytes() + flat.astype("<u2").tobytes()


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 256) -> np.ndarray:
    """Decode one block payload back to n bytes."""
    K = _K_for(n, lanes, step_quant)
    if len(payload) < 2 * lanes:
        raise ValueError("corrupt payload: truncated lane length table")
    lengths = np.frombuffer(payload[:2 * lanes], "<u2").astype(np.int64)
    flat = np.frombuffer(payload[2 * lanes:len(payload) & ~1], "<u2")
    M = 2 * K + 2
    if lengths.max() > M or lengths.min() < 2 or lengths.sum() != flat.size:
        raise ValueError("corrupt payload: lane length table inconsistent")
    streams = np.zeros((lanes, M), np.int32)
    keep = np.arange(M)[None, :] < lengths[:, None]
    streams[keep] = flat
    block = np.asarray(decode_device(jnp.asarray(streams), K))
    return block.astype(np.uint8).reshape(-1)[:n]
