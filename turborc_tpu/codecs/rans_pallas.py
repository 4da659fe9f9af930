"""Flagship codec on the Pallas TPU kernels (format variant, id 57).

Same model semantics as rans-cdf-o0 but a kernel-friendly stream layout:
4096 lanes as 32 groups x 128; each group's words stored in consumption
order (see ops/pallas/rans_kernel.py).  The reference similarly registers
the SIMD build of the same codec under its own bench id (anscdf sse,
id 57) - identical model, different interleave.

Payload: [GROUPS] u32 group word counts + concatenated group streams (u16).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from turborc_tpu.ops.pallas import rans_kernel as K_

GROUPS = K_.GROUPS
LANES = K_.LANES


def _K_for(n: int) -> int:
    K = -(-n // LANES)
    return max(-(-K // K_.CHUNK) * K_.CHUNK, K_.CHUNK)


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 **_unused) -> bytes:
    n = data.shape[0]
    K = _K_for(n)
    padded = np.zeros(LANES * K, np.uint8)
    padded[:n] = data
    block = jnp.asarray(padded.reshape(LANES, K).astype(np.int32))
    enc = K_.encode_tile_pallas if use_pallas_encoder else K_.encode_tile
    gstreams, glens = enc(block, K)
    gstreams = np.asarray(gstreams).reshape(GROUPS, -1)
    glens = np.asarray(glens).astype(np.int64)
    keep = np.arange(gstreams.shape[1])[None, :] < glens[:, None]
    flat = gstreams[keep].astype(np.uint16)
    return glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes()


def decode_block(payload: bytes, n: int, **_unused) -> np.ndarray:
    K = _K_for(n)
    if len(payload) < 4 * GROUPS:
        raise ValueError("corrupt payload: truncated group length table")
    glens = np.frombuffer(payload[:4 * GROUPS], "<u4").astype(np.int64)
    flat = np.frombuffer(payload[4 * GROUPS:len(payload) & ~1], "<u2")
    R = 2 * K + 2 + K_.WROWS
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    gstreams = np.zeros((GROUPS, R * 128), np.int32)
    keep = np.arange(R * 128)[None, :] < glens[:, None]
    gstreams[keep] = flat
    out = K_.decode_tile(jnp.asarray(gstreams.reshape(GROUPS, R, 128)), K)
    # out [K, GROUPS, 128] -> [LANES, K] -> flat
    block = np.asarray(out).reshape(K, LANES).T
    return block.astype(np.uint8).reshape(-1)[:n]
