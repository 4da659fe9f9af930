"""Order-1 flagship codec on the Pallas TPU kernels (id 60).

Model semantics identical to rans_cdf_r1 (rank-quantized order-1
contexts, per-group conditional warm tables); stream layout identical to
rans_pallas (GROUPS consumption-order streams + state seeding).  Lanes
code CONTIGUOUS spans - no share-span striding, no cross-lane sync: the
order-1 context must be the lane's own previous byte, and dropping the
sync butterflies (63% of o0 decode time at SYNC=4) is the speed dividend
that pays for the wider context selects.

Payload: [256] u8 rank permutation + packed o1 warm tables
(blockio.pack_codes over [G, 768] codes) + [GROUPS] u32 group word
counts + concatenated group streams (u16).  Payload layout depends on
geom.groups/chunk (v3 header records them); share/sync/arows are o0
knobs and ignored here.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from turborc_tpu.codecs import blockio as _bio
from turborc_tpu.codecs import rans_cdf_r1 as R1
from turborc_tpu.codecs.rans_pallas import (_bytes_out, _join_seed,
                                            _pad_rows, _rank_perm,
                                            _round_rows, _seed_bytes,
                                            _slice_rows, _split_seed)
from turborc_tpu.ops.pallas import rans_kernel as K0
from turborc_tpu.ops.pallas import rans_o1_kernel as K1
from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

GROUPS = K0.GROUPS
LANES = K0.LANES


def _K_for(n: int, g: Geom = DEFAULT) -> int:
    K = -(-n // g.lanes)
    q = g.chunk
    return max(-(-K // q) * q, q)


def _cum_args(hi_q: np.ndarray, lo_q: np.ndarray):
    """[G,R,16] dequantized freqs -> kernel args [R,16,G] int32 cum."""
    hi = np.transpose(_bio.cumulative(hi_q), (1, 2, 0)).copy()
    lo = np.transpose(_bio.cumulative(lo_q), (1, 2, 0)).copy()
    return jnp.asarray(hi), jnp.asarray(lo)


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 geom: Geom | None = None, **_unused) -> bytes:
    g = geom or DEFAULT
    if g.nstates != 1:
        raise ValueError(
            "the o1 pipeline has no split-state (x2) format: "
            f"geometry {g.spec} requires nstates=1")
    n = data.shape[0]
    perm = _rank_perm(data) if n else np.arange(256, dtype=np.uint8)
    inv = np.zeros(256, np.uint8)
    inv[perm] = np.arange(256, dtype=np.uint8)
    init_states, span_data, _ = _split_seed(inv[data], g)
    K = _K_for(span_data.shape[0], g)
    padded = np.zeros(g.lanes * K, np.uint8)
    padded[:span_data.shape[0]] = span_data
    block = padded.reshape(g.lanes, K)  # contiguous spans, lane l = span l
    G_eff = R1.n_segments(n, g.groups)
    codes, (hi_q, lo_q) = R1.quantize_tables(
        *R1.group_tables(padded, G_eff))
    seg = (np.arange(g.groups, dtype=np.int64) * G_eff) // g.groups
    hi_tbl, lo_tbl = _cum_args(hi_q[seg], lo_q[seg])
    enc = K1.encode_tile_pallas if use_pallas_encoder else K1.encode_tile
    gstreams, glens = enc(jnp.asarray(block), K, hi_tbl, lo_tbl,
                          init_states, geom=g)
    glens = np.asarray(glens).astype(np.int64)
    rows = _round_rows(-(-int(glens.max()) // 128), gstreams.shape[1])
    gs = np.asarray(_slice_rows(gstreams, rows)).reshape(g.groups, -1)
    flat = np.concatenate(
        [gs[gi, :glens[gi]] for gi in range(g.groups)]).astype(np.uint16)
    return (perm.tobytes() + _bio.pack_codes(codes)
            + glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes())


def decode_block(payload: bytes, n: int, geom: Geom | None = None,
                 **_unused) -> np.ndarray:
    g = geom or DEFAULT
    if g.nstates != 1:
        raise ValueError(
            "the o1 pipeline has no split-state (x2) format: "
            f"geometry {g.spec} requires nstates=1")
    s_len = min(n, _seed_bytes(g))
    K = _K_for(n - s_len, g)
    if len(payload) < 256 + 4 + R1.N_ENTRIES:
        raise ValueError("corrupt payload: truncated header")
    perm = np.frombuffer(payload[:256], np.uint8)
    G_eff = R1.n_segments(n, g.groups)
    codes, consumed = _bio.unpack_codes(payload[256:], G_eff,
                                        n_entries=R1.N_ENTRIES)
    hi_q, lo_q = R1.codes_to_tables(codes)
    seg = (np.arange(g.groups, dtype=np.int64) * G_eff) // g.groups
    hi_q, lo_q = hi_q[seg], lo_q[seg]
    off = 256 + consumed
    glens = np.frombuffer(payload[off:off + 4 * g.groups], "<u4").astype(
        np.int64)
    flat = np.frombuffer(payload[off + 4 * g.groups:len(payload) & ~1],
                         "<u2")
    R = 2 * K + 2 + g.wrows
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    Rn = _round_rows(-(-int(glens.max()) // 128) + g.wrows, R)
    gstreams = np.zeros((g.groups, Rn * 128), np.uint16)
    off = 0
    for gi in range(g.groups):
        ln = int(glens[gi])
        gstreams[gi, :ln] = flat[off:off + ln]
        off += ln
    hi_tbl, lo_tbl = _cum_args(hi_q, lo_q)
    dev = _pad_rows(jnp.asarray(gstreams.reshape(g.groups, Rn, 128)), R)
    out, fstates = K1.decode_tile(dev, K, hi_tbl, lo_tbl, geom=g)
    seed_bytes = _join_seed(np.asarray(fstates), s_len)
    lanes_k = np.asarray(_bytes_out(out, K, g.lanes)).T  # [LANES, K]
    flat_bytes = lanes_k.reshape(-1)
    full = np.concatenate([seed_bytes,
                           flat_bytes.astype(np.uint8)[:n - s_len]])
    return perm[full]
