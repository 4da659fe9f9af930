"""Flagship codec on the Pallas TPU kernels (format variant, id 57).

Same model semantics as rans-cdf-o0 but a kernel-friendly stream layout:
4096 lanes as 32 groups x 128; each group's words stored in consumption
order (see ops/pallas/rans_kernel.py).  The reference similarly registers
the SIMD build of the same codec under its own bench id (anscdf sse,
id 57) - identical model, different interleave.

Payload: [16] u16 hi CDF freqs + [256] u16 lo CDF freqs (warm-start
model tables from the block's nibble statistics - with 4096 short lanes
the per-lane adaptation ramp is the dominant ratio cost; cf. the
reference's static cdfini, rccdf.c:50-68) + [GROUPS] u32 group word
counts + concatenated group streams (u16).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from turborc_tpu.ops.pallas import rans_kernel as K_

GROUPS = K_.GROUPS
LANES = K_.LANES
from turborc_tpu.codecs import blockio as _bio

TOTAL = 1 << 15
_TBL_BYTES = 2 * (16 + 256)
build_tables = _bio.nibble_tables
_cumulative = _bio.cumulative


def _K_for(n: int) -> int:
    K = -(-n // LANES)
    return max(-(-K // K_.CHUNK) * K_.CHUNK, K_.CHUNK)


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 **_unused) -> bytes:
    n = data.shape[0]
    K = _K_for(n)
    hi_f, lo_f = build_tables(data)
    hi_tbl = jnp.asarray(_cumulative(hi_f))
    lo_tbl = jnp.asarray(_cumulative(lo_f).reshape(256))
    padded = np.zeros(LANES * K, np.uint8)
    padded[:n] = data
    block = jnp.asarray(padded.reshape(LANES, K).astype(np.int32))
    enc = K_.encode_tile_pallas if use_pallas_encoder else K_.encode_tile
    gstreams, glens = enc(block, K, hi_tbl, lo_tbl)
    gstreams = np.asarray(gstreams).reshape(GROUPS, -1)
    glens = np.asarray(glens).astype(np.int64)
    keep = np.arange(gstreams.shape[1])[None, :] < glens[:, None]
    flat = gstreams[keep].astype(np.uint16)
    return (hi_f.astype("<u2").tobytes() + lo_f.astype("<u2").tobytes()
            + glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes())


def decode_block(payload: bytes, n: int, **_unused) -> np.ndarray:
    K = _K_for(n)
    if len(payload) < _TBL_BYTES + 4 * GROUPS:
        raise ValueError("corrupt payload: truncated header")
    hi_f = np.frombuffer(payload[:32], "<u2").astype(np.int64)
    lo_f = np.frombuffer(payload[32:_TBL_BYTES], "<u2").astype(
        np.int64).reshape(16, 16)
    if hi_f.sum() != TOTAL or (lo_f.sum(axis=-1) != TOTAL).any():
        raise ValueError("corrupt payload: bad warm-start tables")
    off = _TBL_BYTES
    glens = np.frombuffer(payload[off:off + 4 * GROUPS], "<u4").astype(
        np.int64)
    flat = np.frombuffer(payload[off + 4 * GROUPS:len(payload) & ~1], "<u2")
    R = 2 * K + 2 + K_.WROWS
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    gstreams = np.zeros((GROUPS, R * 128), np.int32)
    keep = np.arange(R * 128)[None, :] < glens[:, None]
    gstreams[keep] = flat
    out = K_.decode_tile(jnp.asarray(gstreams.reshape(GROUPS, R, 128)), K,
                         jnp.asarray(_cumulative(hi_f)),
                         jnp.asarray(_cumulative(lo_f).reshape(256)))
    # out [K, GROUPS, 128] -> [LANES, K] -> flat
    block = np.asarray(out).reshape(K, LANES).T
    return block.astype(np.uint8).reshape(-1)[:n]
