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
codecs/rans_pallas.py exactly; geom.groups/chunk set the layout (v3
container header records them).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from turborc_tpu.codecs import rans_pallas as _P
from turborc_tpu.ops.pallas import bittree_kernel as B_
from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

GROUPS = K_.GROUPS
LANES = K_.LANES
TOTAL = 1 << 15


def _K_for(n: int, g: Geom = DEFAULT) -> int:
    K = -(-n // g.lanes)
    return max(-(-K // g.chunk) * g.chunk, g.chunk)


def _shape_lanes(data: np.ndarray, K: int, g: Geom) -> np.ndarray:
    """flat bytes -> [LANES, K], lane l = contiguous span l*K..(l+1)*K."""
    padded = np.zeros(g.lanes * K, np.uint8)
    padded[:data.shape[0]] = data
    return padded.reshape(g.lanes, K)


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 geom: Geom | None = None, **_unused) -> bytes:
    g = geom or DEFAULT
    if g.nstates != 1:
        raise ValueError(
            "the bittree pipeline has no split-state (x2) format: "
            f"geometry {g.spec} requires nstates=1")
    if g.rate != 7:
        raise ValueError(
            "the bittree XLA twin runs the fixed CDFRATE=7 update: "
            f"geometry {g.spec} requires rate=7")
    init_states, span_data, _ = _P._split_seed(data, g)
    K = _K_for(span_data.shape[0], g)
    block = _shape_lanes(span_data, K, g)
    tree = B_.warm_tree(span_data)
    enc = B_.encode_tile_pallas if use_pallas_encoder else B_.encode_tile
    gstreams, glens = enc(jnp.asarray(block), K, jnp.asarray(tree),
                          init_states, geom=g)
    glens = np.asarray(glens).astype(np.int64)
    rows = _P._round_rows(-(-int(glens.max()) // 128), gstreams.shape[1])
    gs = np.asarray(_P._slice_rows(gstreams, rows)).reshape(g.groups, -1)
    flat = np.concatenate(
        [gs[gi, :glens[gi]] for gi in range(g.groups)]).astype(np.uint16)
    return (tree[1:].astype("<u2").tobytes()
            + glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes())


def decode_block(payload: bytes, n: int, geom: Geom | None = None,
                 **_unused) -> np.ndarray:
    g = geom or DEFAULT
    if g.nstates != 1:
        raise ValueError(
            "the bittree pipeline has no split-state (x2) format: "
            f"geometry {g.spec} requires nstates=1")
    if g.rate != 7:
        raise ValueError(
            "the bittree XLA twin runs the fixed CDFRATE=7 update: "
            f"geometry {g.spec} requires rate=7")
    s_len = min(n, _P._seed_bytes(g))
    K = _K_for(n - s_len, g)
    if len(payload) < 510 + 4 * g.groups:
        raise ValueError("corrupt payload: truncated header")
    tree = np.zeros(256, np.int32)
    tree[1:] = np.frombuffer(payload[:510], "<u2").astype(np.int32)
    if tree[1:].min() < 1 or tree[1:].max() > TOTAL - 1:
        raise ValueError("corrupt payload: bad warm-start tree")
    off = 510
    glens = np.frombuffer(payload[off:off + 4 * g.groups], "<u4").astype(
        np.int64)
    flat = np.frombuffer(payload[off + 4 * g.groups:len(payload) & ~1],
                         "<u2")
    R = 2 * K + 2 + g.wrows
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    Rn = _P._round_rows(-(-int(glens.max()) // 128) + g.wrows, R)
    gstreams = np.zeros((g.groups, Rn * 128), np.uint16)
    pos = 0
    for gi in range(g.groups):
        ln = int(glens[gi])
        gstreams[gi, :ln] = flat[pos:pos + ln]
        pos += ln
    dev = _P._pad_rows(jnp.asarray(gstreams.reshape(g.groups, Rn, 128)), R)
    out, fstates = B_.decode_tile(dev, K, jnp.asarray(tree), geom=g)
    seed_bytes = _P._join_seed(np.asarray(fstates), s_len)
    lanes_k = np.asarray(_P._bytes_out(out, K, g.lanes)).T  # [LANES, K]
    flat_bytes = lanes_k.reshape(-1)
    return np.concatenate([seed_bytes,
                           flat_bytes.astype(np.uint8)[:n - s_len]])
