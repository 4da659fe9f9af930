"""Bitwise-tree codec on the Pallas TPU kernels (`rc-p`, id 8).

Kernel-accelerated member of the `rc` family (reference rc id 1,
rc_.c:37-65): the identical 255-node adaptive bit-tree model, coded
nibble-grouped via exact interval subdivision so a byte costs 2 rANS
steps instead of 8 binary ones (ops/pallas/bittree_kernel.py docstring).
The scan-based rc-o0 (codecs/rc_bit.py) keeps bit-exact reference
semantics; this variant is the TPU fast path - same role the SIMD
anscdf build plays for the reference's scalar coders.

Payload: [255] u16 warm-start tree probabilities + [GROUPS] u32 group
word counts + concatenated consumption-order group streams (u16).
Stream framing, state seeding and device-link compaction follow
codecs/rans_pallas.py exactly.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from turborc_tpu.codecs import rans_pallas as _P
from turborc_tpu.ops.pallas import bittree_kernel as B_
from turborc_tpu.ops.pallas import rans_kernel as K_

GROUPS = K_.GROUPS
LANES = K_.LANES
TOTAL = 1 << 15


def _K_for(n: int) -> int:
    K = -(-n // LANES)
    return max(-(-K // K_.CHUNK) * K_.CHUNK, K_.CHUNK)


def _shape_lanes(data: np.ndarray, K: int) -> np.ndarray:
    """flat bytes -> [LANES, K], lane l = contiguous span l*K..(l+1)*K."""
    padded = np.zeros(LANES * K, np.uint8)
    padded[:data.shape[0]] = data
    return padded.reshape(LANES, K)


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 **_unused) -> bytes:
    init_states, span_data, _ = _P._split_seed(data)
    K = _K_for(span_data.shape[0])
    block = _shape_lanes(span_data, K)
    tree = B_.warm_tree(span_data)
    enc = B_.encode_tile_pallas if use_pallas_encoder else B_.encode_tile
    gstreams, glens = enc(jnp.asarray(block), K, jnp.asarray(tree),
                          init_states)
    glens = np.asarray(glens).astype(np.int64)
    rows = _P._round_rows(-(-int(glens.max()) // 128), gstreams.shape[1])
    gs = np.asarray(_P._slice_rows(gstreams, rows)).reshape(GROUPS, -1)
    flat = np.concatenate(
        [gs[g, :glens[g]] for g in range(GROUPS)]).astype(np.uint16)
    return (tree[1:].astype("<u2").tobytes()
            + glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes())


def decode_block(payload: bytes, n: int, **_unused) -> np.ndarray:
    s_len = min(n, _P.SEED_BYTES)
    K = _K_for(n - s_len)
    if len(payload) < 510 + 4 * GROUPS:
        raise ValueError("corrupt payload: truncated header")
    tree = np.zeros(256, np.int32)
    tree[1:] = np.frombuffer(payload[:510], "<u2").astype(np.int32)
    if tree[1:].min() < 1 or tree[1:].max() > TOTAL - 1:
        raise ValueError("corrupt payload: bad warm-start tree")
    off = 510
    glens = np.frombuffer(payload[off:off + 4 * GROUPS], "<u4").astype(
        np.int64)
    flat = np.frombuffer(payload[off + 4 * GROUPS:len(payload) & ~1], "<u2")
    R = 2 * K + 2 + K_.WROWS
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    Rn = _P._round_rows(-(-int(glens.max()) // 128) + K_.WROWS, R)
    gstreams = np.zeros((GROUPS, Rn * 128), np.uint16)
    pos = 0
    for g in range(GROUPS):
        ln = int(glens[g])
        gstreams[g, :ln] = flat[pos:pos + ln]
        pos += ln
    dev = _P._pad_rows(jnp.asarray(gstreams.reshape(GROUPS, Rn, 128)), R)
    out, fstates = B_.decode_tile(dev, K, jnp.asarray(tree))
    seed_bytes = _P._join_seed(np.asarray(fstates), s_len)
    lanes_k = np.asarray(_P._bytes_out(out, K)).T       # [LANES, K]
    flat_bytes = lanes_k.reshape(-1)
    return np.concatenate([seed_bytes,
                           flat_bytes.astype(np.uint8)[:n - s_len]])
