"""Flagship codec on the Pallas TPU kernels (format variant, id 57).

Same model semantics as rans-cdf-s8 (share-SHARE span models, per-group
warm-start) with a kernel-friendly stream layout: LANES lanes as GROUPS
x 128; each group's words stored in consumption order (see
ops/pallas/rans_kernel.py).  The reference similarly registers the SIMD
build of the same codec under its own bench id (anscdf sse, id 57) -
identical model, different interleave.

Format v2 (round 2): SHARE adjacent lanes share one adaptive model over
a contiguous SHARE*K-byte span (lane j decodes bytes t*SHARE+j), and the
warm-start tables are per GROUP (contiguous 128*K bytes), cutting the
per-lane adaptation ramp that cost round 1 1.1pp of ratio on 64MB blocks.

Format v3 (round 3): the kernel geometry (groups/chunk/share/sync/lsync/
arows) is a runtime argument recorded in the container header instead of
an env-var module constant - see ops/pallas/geom.py.

Payload: [256] u8 byte permutation (global frequency-rank remap, worth
~0.04pp on text: skews the hi-nibble distribution) + packed warm tables
(blockio.pack_codes: 8-bit log codes, per-group nibble deltas) +
[GROUPS] u32 group word counts + concatenated group streams (u16).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

GROUPS = DEFAULT.groups
LANES = DEFAULT.lanes
SHARE = DEFAULT.share
from turborc_tpu.codecs import blockio as _bio

TOTAL = 1 << 15


def _K_for(n: int, g: Geom = DEFAULT) -> int:
    K = -(-n // g.lanes)
    q = g.step_quant  # grid-step AND cold-sync alignment
    return max(-(-K // q) * q, q)


def _group_tables(padded: np.ndarray, g: Geom = DEFAULT):
    """Per-group warm tables from each group's contiguous slice."""
    per = padded.shape[0] // g.groups
    his, los = [], []
    for gi in range(g.groups):
        hi_f, lo_f = _bio.nibble_tables(padded[gi * per:(gi + 1) * per])
        his.append(hi_f)
        los.append(lo_f)
    return np.stack(his), np.stack(los)  # [G,16], [G,16,16]


def _cum_args(hi_f: np.ndarray, lo_f: np.ndarray):
    """freq tables -> kernel args hi [16,G], lo [16,16,G] int32."""
    hi = _bio.cumulative(hi_f).T.copy()                    # [16, G]
    lo = np.transpose(_bio.cumulative(lo_f), (1, 2, 0)).copy()
    return jnp.asarray(hi), jnp.asarray(lo)


def _shape_lanes(data: np.ndarray, K: int, g: Geom = DEFAULT):
    """flat bytes -> [LANES, K] in kernel lane order (strided spans).

    Kept uint8: the host<->device link is the end-to-end bottleneck
    (tunneled dev rigs ~30 MB/s, PCIe DMA on real pods), so blocks ride
    compact and the kernels cast to int32 on-device."""
    S = g.lanes // g.share
    padded = np.zeros(g.lanes * K, np.uint8)
    padded[:data.shape[0]] = data
    return (padded.reshape(S, K, g.share).transpose(0, 2, 1)
            .reshape(g.lanes, K)), padded


# Device-side helpers so only compact bytes cross the host<->device link:
# streams travel sliced to the occupied rows (rounded to 256-row steps to
# bound program variants), the padded worst-case buffer is rebuilt by a
# trivial on-device pad, and decoded bytes come back as uint8.

@functools.partial(jax.jit, static_argnames=("rows",))
def _slice_rows(gs, rows):
    return gs[:, :rows, :].astype(jnp.uint16)  # words are 16-bit


@functools.partial(jax.jit, static_argnames=("R",))
def _pad_rows(gs, R):
    G, Rn, L = gs.shape
    return (jnp.zeros((G, R, L), jnp.int32)
            .at[:, :Rn, :].set(gs.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("K", "lanes"))
def _bytes_out(out, K, lanes=LANES):
    return out.reshape(K, lanes).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("K", "S", "share"))
def _post_decode(out, perm, K, S, share):
    """Kernel output [K, G, 128] -> file-order remapped bytes [S*share*K]
    on device: un-stride the share spans and apply the rank permutation,
    so only the final uint8 payload crosses the host<->device link."""
    x = out.reshape(K, S, share).transpose(1, 0, 2).reshape(-1)
    return jnp.take(perm, x, indices_are_sorted=False).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("K", "S", "share", "groups"))
def _pre_encode(data_dev, inv, K, S, share, groups):
    """Device-side encode prep: rank-remap the padded span bytes and
    shape them into kernel lane order [LANES, K] (uint8; the kernel
    casts).  data_dev is the padded span [S*share*K] uint8."""
    mapped = jnp.take(inv, data_dev.astype(jnp.int32))
    block = (mapped.reshape(S, K, share).transpose(0, 2, 1)
             .reshape(S * share, K))
    return block.astype(jnp.uint8)


def _round_rows(rows_needed: int, cap: int) -> int:
    return min(cap, -(-rows_needed // 256) * 256)


# State seeding: the first SEED_BYTES of the (remapped) block ride inside
# the per-lane encoder initial states instead of being entropy-coded -
# the decoder's FINAL states return them for free.  rANS conserves
# stream_bits + log2(state): raising state0 above the 2^15 floor costs
# exactly those bits in the stream, so only the floor's OWN 15 bits are
# free real estate (state0 = 2^15 | seed15).  Net gain ~= 15 * ratio -
# 0.5 bits/lane (raw bits dodge their coded cost; +0.5 = E[log2 growth
# above the floor]).  (Measured: a 2^30 seed variant LOST 7KB - the +15
# structural bits outweighed the 8.2 carried-entropy bits.)
SEED_BITS = 15
SEED_BYTES = SEED_BITS * LANES // 8


def _seed_bytes(g: Geom) -> int:
    return SEED_BITS * g.lanes * g.nstates // 8


def _split_seed(data: np.ndarray, g: Geom = DEFAULT):
    sb = _seed_bytes(g)
    s_len = min(data.shape[0], sb)
    buf = np.zeros(sb, np.uint8)
    buf[:s_len] = data[:s_len]
    bits = np.unpackbits(buf).reshape(g.nstates * g.lanes, SEED_BITS)
    pw = (1 << np.arange(SEED_BITS - 1, -1, -1)).astype(np.int64)
    seeds = bits.astype(np.int64) @ pw                # [nstates * LANES]
    init = (jnp.asarray((seeds | (1 << SEED_BITS)).astype(np.int64))
            .astype(jnp.uint32).astype(jnp.int32))
    shape = ((g.groups, 128) if g.nstates == 1
             else (g.nstates, g.groups, 128))
    return init.reshape(shape), data[s_len:], s_len


def _join_seed(fstates: np.ndarray, s_len: int) -> np.ndarray:
    seeds = fstates.reshape(-1).astype(np.int64) & 0xFFFFFFFF
    if (seeds >> SEED_BITS != 1).any():
        raise ValueError("corrupt payload: bad final coder states")
    seeds &= (1 << SEED_BITS) - 1
    bits = ((seeds[:, None] >> np.arange(SEED_BITS - 1, -1, -1)) & 1)
    return np.packbits(bits.astype(np.uint8).reshape(-1))[:s_len]


def _rank_perm(data: np.ndarray) -> np.ndarray:
    counts = np.bincount(data, minlength=256)
    return np.argsort(-counts, kind="stable").astype(np.uint8)


def _group_byte_counts(span: np.ndarray, g: Geom, K: int,
                       pad_byte: int) -> np.ndarray:
    """[G, 256] original-byte counts over each group's padded span slice
    (one host bincount pass; the remap is applied to the COLUMNS later,
    so the full remapped array never materializes on host).  Padding is
    the most-frequent byte (pad_byte = perm[0]) so it codes at rank 0."""
    per = g.lanes * K // g.groups
    counts = np.zeros((g.groups, 256), np.int64)
    for gi in range(g.groups):
        s = span[gi * per:(gi + 1) * per]
        if s.size:
            counts[gi] = np.bincount(s, minlength=256)
        counts[gi, pad_byte] += per - s.size
    return counts


def encode_block(data: np.ndarray, use_pallas_encoder: bool = True,
                 geom: Geom | None = None, **_unused) -> bytes:
    g = geom or DEFAULT
    n = data.shape[0]
    perm = _rank_perm(data) if n else np.arange(256, dtype=np.uint8)
    inv = np.zeros(256, np.uint8)
    inv[perm] = np.arange(256, dtype=np.uint8)
    sb = _seed_bytes(g)
    s_len = min(n, sb)
    init_states, _, _ = _split_seed(inv[data[:s_len]], g)
    span = data[s_len:]
    K = _K_for(span.shape[0], g)
    # warm tables: original-byte histograms, remap applied to the columns
    jr = _group_byte_counts(span, g, K, int(perm[0]))[:, perm]
    hi_q_raw = _bio.quantize_freqs(jr.reshape(g.groups, 16, 16).sum(-1))
    lo_q_raw = _bio.quantize_freqs(jr.reshape(g.groups, 16, 16))
    codes, (hi_q, lo_q) = _bio.quantize_tables(hi_q_raw, lo_q_raw)
    hi_tbl, lo_tbl = _cum_args(hi_q, lo_q)
    # remap + lane striding on device: only original bytes cross the link
    padded = np.full(g.lanes * K, perm[0], np.uint8)
    padded[:span.shape[0]] = span
    S = g.lanes // g.share
    block = _pre_encode(jnp.asarray(padded), jnp.asarray(inv), K, S,
                        g.share, g.groups)
    enc = K_.encode_tile_pallas if use_pallas_encoder else K_.encode_tile
    gstreams, glens = enc(block, K, hi_tbl, lo_tbl, init_states, geom=g)
    nst = g.nstates * g.groups  # stream count (x2: hi set then lo set)
    if g.nstates == 2:
        gstreams = gstreams.reshape(nst, gstreams.shape[2],
                                    gstreams.shape[3])
    glens = np.asarray(glens).astype(np.int64).reshape(nst)
    rows = _round_rows(-(-int(glens.max()) // 128), gstreams.shape[1])
    gs = np.asarray(_slice_rows(gstreams, rows)).reshape(nst, -1)
    keep = (np.arange(gs.shape[1])[None, :] < glens[:, None])
    flat = gs[keep].astype(np.uint16)
    return (perm.tobytes() + _bio.pack_codes(codes)
            + glens.astype("<u4").tobytes() + flat.astype("<u2").tobytes())


def decode_block(payload: bytes, n: int, geom: Geom | None = None,
                 **_unused) -> np.ndarray:
    g = geom or DEFAULT
    s_len = min(n, _seed_bytes(g))
    K = _K_for(n - s_len, g)
    if len(payload) < 256 + 4 + 272:
        raise ValueError("corrupt payload: truncated header")
    perm = np.frombuffer(payload[:256], np.uint8)
    codes, consumed = _bio.unpack_codes(payload[256:], g.groups)
    hi_q, lo_q = _bio.codes_to_tables(codes)
    off = 256 + consumed
    nst = g.nstates * g.groups  # stream count (x2: hi set then lo set)
    glens = np.frombuffer(payload[off:off + 4 * nst], "<u4").astype(
        np.int64)
    flat = np.frombuffer(payload[off + 4 * nst:len(payload) & ~1],
                         "<u2")
    R = (2 * K if g.nstates == 1 else K) + 2 + g.wrows
    if glens.max() > R * 128 or glens.min() < 256 or \
            glens.sum() != flat.size:
        raise ValueError("corrupt payload: group length table inconsistent")
    # compact host buffer (occupied rows + window slack only), per-group
    # contiguous copies; the worst-case R rows are re-padded on-device
    Rn = _round_rows(-(-int(glens.max()) // 128) + g.wrows, R)
    gstreams = np.zeros((nst, Rn * 128), np.uint16)
    off = 0
    for gi in range(nst):
        ln = int(glens[gi])
        gstreams[gi, :ln] = flat[off:off + ln]
        off += ln
    hi_tbl, lo_tbl = _cum_args(hi_q, lo_q)
    dev = _pad_rows(jnp.asarray(gstreams.reshape(nst, Rn, 128)), R)
    if g.nstates == 2:
        dev = dev.reshape(2, g.groups, R, 128)
        out, fstates = K_.decode_tile_x2(dev, K, hi_tbl, lo_tbl, geom=g)
    else:
        out, fstates = K_.decode_tile(dev, K, hi_tbl, lo_tbl, geom=g)
    # un-stride + unmap ON DEVICE; only final uint8 bytes cross the link
    S = g.lanes // g.share
    flat_bytes = np.asarray(_post_decode(out, jnp.asarray(perm), K, S,
                                         g.share))
    # seeds ride in the decoder's final states (15 bits/lane)
    seed_bytes = _join_seed(np.asarray(fstates), s_len)
    return np.concatenate([perm[seed_bytes], flat_bytes[:n - s_len]])
