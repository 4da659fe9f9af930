"""Static-CDF byte rANS - reference `cdfs*` / static nibble families
(rccdf.c:50-184, anscdf.c:57-85, bench ids 42-45/65).

The per-block CDF is built from the block histogram on the host (reference
`cdfini`, rccdf.c:50-68) and shared by all lanes.  No adaptation means the
model pass is fully data-parallel (a table lookup, no scan), so encode is
one vectorized lookup + the backward coding scan, and decode's symbol
search is a searchsorted against one shared 257-entry table.

Payload: [256] u16 frequency table, then packed lane streams.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.ops import rans

RC_BITS = 15
TOTAL = 1 << RC_BITS


def build_freqs(data: np.ndarray) -> np.ndarray:
    """Normalize a byte histogram to sum 2^15 with freq>=1 for present
    symbols (cdfini semantics, rccdf.c:50-68; exact scheme is ours)."""
    h = np.bincount(data, minlength=256).astype(np.int64)
    n = h.sum()
    if n == 0:
        f = np.zeros(256, np.int64)
        f[0] = TOTAL
        return f.astype(np.uint16)
    f = np.where(h > 0, np.maximum(1, h * (TOTAL - 256) // n), 0)
    # distribute the remainder to the most frequent symbol
    f[np.argmax(h)] += TOTAL - f.sum()
    assert f.sum() == TOTAL and (f[h > 0] >= 1).all()
    return f.astype(np.uint16)


@functools.partial(jax.jit, static_argnames=("K",))
def encode_device(block: jnp.ndarray, cdf: jnp.ndarray, K: int):
    """block [L, K] bytes, cdf [257] int32 -> (streams, lengths)."""
    lows_tab = cdf[:-1]
    freqs_tab = cdf[1:] - cdf[:-1]
    sym = block.T.reshape(K, -1)  # [K, L]
    words, emit, st = rans.encode_backward(
        lows_tab[sym], freqs_tab[sym])
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_device(streams: jnp.ndarray, cdf: jnp.ndarray, K: int):
    state, pos = rans.dec_init(streams)
    U = 16 if K % 16 == 0 else 1

    def dec(carry, _):
        state, pos = carry
        outs = []
        for _u in range(U):
            value = (state & rans.MASK15).astype(jnp.int32)
            sym = jnp.searchsorted(cdf, value, side="right").astype(
                jnp.int32) - 1
            low = cdf[sym]
            freq = cdf[sym + 1] - low
            state = rans.dec_update(state, low, freq)
            state, pos = rans.dec_renorm(state, streams, pos)
            outs.append(sym)
        return (state, pos), jnp.stack(outs)

    _, bytes_t = jax.lax.scan(dec, (state, pos), None, length=K // U)
    return bytes_t.reshape(K, -1).T


def encode_block(data: np.ndarray, lanes: int = 512, step_quant: int = 256,
                 **_unused) -> bytes:
    freqs = build_freqs(data)
    cdf = np.zeros(257, np.int32)
    np.cumsum(freqs, out=cdf[1:])
    block, K = blockio.shape_block(data, lanes, step_quant)
    # padding bytes are 0; guarantee symbol 0 is codeable
    if data.shape[0] < lanes * K and freqs[0] == 0:
        freqs = freqs.copy()
        src = int(np.argmax(freqs))
        freqs[src] -= 1
        freqs[0] = 1
        cdf = np.zeros(257, np.int32)
        np.cumsum(freqs, out=cdf[1:])
    streams, lengths = encode_device(blockio.push_u8(block),
                                     jnp.asarray(cdf), K)
    return freqs.astype("<u2").tobytes() + blockio.pack_device(
        streams, lengths)


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> np.ndarray:
    K = blockio.K_for(n, lanes, step_quant)
    freqs = np.frombuffer(payload[:512], "<u2").astype(np.int64)
    if freqs.sum() != TOTAL:
        raise ValueError("corrupt payload: bad static CDF table")
    cdf = np.zeros(257, np.int32)
    np.cumsum(freqs, out=cdf[1:])
    streams = blockio.unpack_device(payload[512:], lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_device(streams, jnp.asarray(cdf), K))
    return block.reshape(-1)[:n]
