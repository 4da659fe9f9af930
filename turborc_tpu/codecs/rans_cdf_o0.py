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


def _model_init(L: int, hi_tbl=None, lo_tbl=None):
    """Per-lane model tables; optionally warm-started from block stats
    (cumulative [16] / [16,16] int32 rows, see blockio.nibble_tables)."""
    if hi_tbl is None:
        return cdf16.init((L,)), cdf16.init((L, 16))
    return (jnp.broadcast_to(hi_tbl, (L, 16)),
            jnp.broadcast_to(lo_tbl, (L, 16, 16)))


# byte-columns processed per scan iteration: amortizes the fixed per-step
# cost of a TPU while-loop iteration over UNROLL x L symbols.
UNROLL = 16


@functools.partial(jax.jit, static_argnames=("K",))
def encode_device(block: jnp.ndarray, K: int, hi_tbl=None, lo_tbl=None):
    """block [L, K] int32 bytes -> (streams [L, 2K+2] i32, lengths [L])."""
    L = block.shape[0]
    U = UNROLL if K % UNROLL == 0 else 1
    cols = block.T.reshape(K // U, U, L)  # scan over time, U columns/step

    def fwd(carry, bs):
        cdf_hi, cdf_lo = carry
        outs = []
        for u in range(bs.shape[0]):
            b = bs[u]
            hi, lo = b >> 4, b & 15
            low_h, fr_h = cdf16.lookup(cdf_hi, hi)
            cdf_hi = cdf16.update(cdf_hi, low_h)
            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = _lo_row(cdf_lo, sel)
            low_l, fr_l = cdf16.lookup(row, lo)
            cdf_lo = _lo_put(cdf_lo, sel, row, cdf16.update(row, low_l))
            outs.append(jnp.stack([jnp.stack([low_h, fr_h]),
                                   jnp.stack([low_l, fr_l])]))
        # [U, 2(sym), 2(low/freq), L]
        return (cdf_hi, cdf_lo), jnp.stack(outs)

    _, probs = jax.lax.scan(fwd, _model_init(L, hi_tbl, lo_tbl), cols)
    probs = probs.reshape(2 * K, 2, L)  # symbol-time major
    words, emit, state = rans.encode_backward(probs[:, 0], probs[:, 1])
    return rans.stitch(words, emit, state)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_device(streams: jnp.ndarray, K: int, hi_tbl=None, lo_tbl=None):
    """streams [L, 2K+2] int32 words -> block [L, K] int32 bytes."""
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    U = UNROLL if K % UNROLL == 0 else 1

    def nibble(cdf, state):
        value = (state & rans.MASK15).astype(jnp.int32)
        sym, low, freq = cdf16.search(cdf, value)
        state = rans.dec_update(state, low, freq)
        return sym, low, state

    def dec(carry, _):
        cdf_hi, cdf_lo, state, pos = carry
        outs = []
        for _u in range(U):
            hi, low_h, state = nibble(cdf_hi, state)
            cdf_hi = cdf16.update(cdf_hi, low_h)
            state, pos = rans.dec_renorm(state, streams, pos)

            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = _lo_row(cdf_lo, sel)
            lo, low_l, state = nibble(row, state)
            cdf_lo = _lo_put(cdf_lo, sel, row, cdf16.update(row, low_l))
            state, pos = rans.dec_renorm(state, streams, pos)
            outs.append((hi << 4) | lo)
        return (cdf_hi, cdf_lo, state, pos), jnp.stack(outs)

    cdf_hi, cdf_lo = _model_init(L, hi_tbl, lo_tbl)
    _, bytes_t = jax.lax.scan(dec, (cdf_hi, cdf_lo, state, pos), None,
                              length=K // U)
    return bytes_t.reshape(K, L).T  # [L, K]


# ----------------------------------------------------------------------------
# Host block API (fixed-shape padding, stream packing)
# ----------------------------------------------------------------------------

from turborc_tpu.codecs import blockio

_K_for = blockio.K_for
_shape_block = blockio.shape_block
_pack = blockio.pack
_unpack = blockio.unpack


_TBL_BYTES = 2 * (16 + 256)


def encode_block(data: np.ndarray, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> bytes:
    """Encode one block -> payload: warm-start tables (544 B) + lane
    lengths + stitched streams."""
    hi_f, lo_f = blockio.nibble_tables(data)
    block, K = _shape_block(data, lanes, step_quant)
    streams, lengths = encode_device(
        blockio.push_u8(block), K, jnp.asarray(blockio.cumulative(hi_f)),
        jnp.asarray(blockio.cumulative(lo_f)))
    return (hi_f.astype("<u2").tobytes() + lo_f.astype("<u2").tobytes()
            + blockio.pack_device(streams, lengths))


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> np.ndarray:
    """Decode one block payload back to n bytes."""
    if len(payload) < _TBL_BYTES:
        raise ValueError("corrupt payload: truncated warm-start tables")
    hi_f = np.frombuffer(payload[:32], "<u2").astype(np.int64)
    lo_f = np.frombuffer(payload[32:_TBL_BYTES], "<u2").astype(
        np.int64).reshape(16, 16)
    if hi_f.sum() != blockio.TOTAL or \
            (lo_f.sum(axis=-1) != blockio.TOTAL).any():
        raise ValueError("corrupt payload: bad warm-start tables")
    K = _K_for(n, lanes, step_quant)
    streams = blockio.unpack_device(payload[_TBL_BYTES:], lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_device(
        streams, K, jnp.asarray(blockio.cumulative(hi_f)),
        jnp.asarray(blockio.cumulative(lo_f))))
    return block.reshape(-1)[:n]
