"""Bitwise byte codecs: order-0 / order-1 binary-tree models over any
adaptive bit predictor - the `rc` / `rcc` families of the reference
(rc_.c:37-65 / :187-211, models mb_o0.h:89-112).

A byte x is coded as 8 bits MSB->LSB; the predictor slot for bit i is the
tree node x>>(8-i) | prefix (node index 1..255), optionally offset by a
byte context (order-1: previous byte).  Lane-parallel: every lane owns its
own [N] predictor table and rANS state; the coding side rides
ops/rans.encode_backward exactly like the CDF codecs (forward model pass ->
backward coding pass -> compaction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.models import bitpred
from turborc_tpu.ops import binary, rans

UNROLL = 8


def _ctx_slots(order: int) -> int:
    """Tree nodes per lane: 256 per byte context.  Order 2 holds the FULL
    2^16 byte-pair contexts like the reference's heap table (rc_.c:348,
    2^16 x 256 u16) - usable only at low lane counts (the block API
    defaults rcc2 to 16 lanes: 16 x 16.7M x 4B = 1 GB HBM)."""
    return 256 * (1 if order == 0 else 256 if order == 1 else 65536)


def _ctx_next(order: int, ctx, b):
    if order == 0:
        return ctx
    if order == 1:
        return b
    return (b << 8) | (ctx >> 8)  # (prev1 << 8) | prev2


def _fwd_byte(pred, state, ctx, b):
    """Model one byte column: returns (state', probs [8, L], bits [8, L])."""
    probs, bits = [], []
    node = jnp.ones_like(b)
    for i in range(7, -1, -1):
        idx = ctx * 256 + node
        p = binary.clamp_p(pred.predict(state, idx))
        bit = (b >> i) & 1
        state = pred.update(state, idx, p, bit.astype(jnp.bool_))
        probs.append(p)
        bits.append(bit)
        node = (node << 1) | bit
    return state, jnp.stack(probs), jnp.stack(bits)


def _dec_byte(pred, state, ctx, ans_state, streams, pos):
    node = jnp.ones_like(ctx)
    for _ in range(8):
        idx = ctx * 256 + node
        p = binary.clamp_p(pred.predict(state, idx))
        bit, ans_state = binary.dec_bit(ans_state, p)
        state = pred.update(state, idx, p, bit)
        ans_state, pos = rans.dec_renorm(ans_state, streams, pos)
        node = (node << 1) | bit.astype(jnp.int32)
    return state, node & 0xFF, ans_state, pos


@functools.partial(jax.jit, static_argnames=("K", "order", "pred_name",
                                              "prm0", "prm1"))
def encode_device(block: jnp.ndarray, K: int, order: int = 0,
                  pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = block.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)
    U = UNROLL if K % UNROLL == 0 else 1
    cols = block.T.reshape(K // U, U, L)

    def fwd(carry, bs):
        state, ctx = carry
        ps, bts = [], []
        for u in range(bs.shape[0]):
            b = bs[u]
            state, probs, bits = _fwd_byte(pred, state, ctx, b)
            ctx = _ctx_next(order, ctx, b)
            ps.append(probs)
            bts.append(bits)
        return (state, ctx), (jnp.stack(ps), jnp.stack(bts))

    init = (pred.init(L, _ctx_slots(order)), jnp.zeros((L,), jnp.int32))
    _, (probs, bits) = jax.lax.scan(fwd, init, cols)
    probs = probs.reshape(8 * K, L)
    bits = bits.reshape(8 * K, L).astype(jnp.bool_)
    lows, freqs = binary.to_low_freq(probs, bits)
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "order", "pred_name",
                                              "prm0", "prm1"))
def decode_device(streams: jnp.ndarray, K: int, order: int = 0,
                  pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = streams.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)
    ans_state, pos = rans.dec_init(streams)
    U = UNROLL if K % UNROLL == 0 else 1

    def dec(carry, _):
        state, ctx, ans_state, pos = carry
        outs = []
        for _u in range(U):
            state, byte, ans_state, pos = _dec_byte(
                pred, state, ctx, ans_state, streams, pos)
            ctx = _ctx_next(order, ctx, byte)
            outs.append(byte)
        return (state, ctx, ans_state, pos), jnp.stack(outs)

    init = (pred.init(L, _ctx_slots(order)), jnp.zeros((L,), jnp.int32),
            ans_state, pos)
    _, bytes_t = jax.lax.scan(dec, init, None, length=K // U)
    return bytes_t.reshape(K, L).T


# ---------------------------------------------------------------------------
# host block API - shared shape/packing logic with the CDF codec
# ---------------------------------------------------------------------------

from turborc_tpu.codecs import rans_cdf_o0 as _base


def _make_block_api(order: int, pred_name: str):
    def encode_block(data: np.ndarray, lanes: int = 512,
                     step_quant: int = 256, prm0: int = 5,
                     prm1: int = 8, **_unused) -> bytes:
        from turborc_tpu.codecs import blockio
        block, K = _base._shape_block(data, lanes, step_quant)
        streams, lengths = encode_device(
            blockio.push_u8(block), K, order, pred_name, prm0, prm1)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 512,
                     step_quant: int = 256, prm0: int = 5,
                     prm1: int = 8, **_unused) -> np.ndarray:
        from turborc_tpu.codecs import blockio
        K = _base._K_for(n, lanes, step_quant)
        streams = blockio.unpack_device(payload, lanes, 8 * K + 2)
        block = blockio.fetch_u8(decode_device(
            streams, K, order, pred_name, prm0, prm1))
        return block.reshape(-1)[:n]

    return encode_block, decode_block


rc_s_encode, rc_s_decode = _make_block_api(0, "s")
rcc_s_encode, rcc_s_decode = _make_block_api(1, "s")
rc_ss_encode, rc_ss_decode = _make_block_api(0, "ss")
rcc_ss_encode, rcc_ss_decode = _make_block_api(1, "ss")
rc_sf_encode, rc_sf_decode = _make_block_api(0, "sf")
rcc_sf_encode, rcc_sf_decode = _make_block_api(1, "sf")


# ansb codes 64KB sub-blocks regardless of the container block size:
# with only 4 lanes, a large block overflows the u16 per-lane stream
# length field, and 64KB x 4 states IS the reference design point.
_ANSB_BLK = 1 << 16


def ansb_encode(data, lanes=4, **kw):
    """Bitwise ANS at the reference's design point (ansbc, anscdf.c:
    669-705): 4 interleaved binary-rANS states over an o0 tree model,
    64KB sub-blocks.  Our lanes ARE the interleaved states.
    Sub-payloads are u32-length framed."""
    import struct
    kw.pop("step_quant", None)
    enc = _make_block_api(0, "s")[0]
    out = []
    for off in range(0, max(data.shape[0], 1), _ANSB_BLK):
        pay = enc(data[off:off + _ANSB_BLK], lanes=4, step_quant=256, **kw)
        out.append(struct.pack("<I", len(pay)) + pay)
    return b"".join(out)


def ansb_decode(payload, n, lanes=4, **kw):
    import struct
    kw.pop("step_quant", None)
    dec = _make_block_api(0, "s")[1]
    out, off, left = [], 0, n
    while left > 0:
        if off + 4 > len(payload):
            raise ValueError("corrupt payload: truncated ansb sub-block")
        ln = struct.unpack_from("<I", payload, off)[0]
        off += 4
        if off + ln > len(payload):
            raise ValueError("corrupt payload: ansb sub-block overruns")
        m = min(_ANSB_BLK, left)
        out.append(dec(bytes(payload[off:off + ln]), m, lanes=4,
                       step_quant=256, **kw))
        off += ln
        left -= m
    return (np.concatenate(out) if out
            else np.zeros(0, np.uint8))


def rcc2_encode(data, lanes=16, **kw):
    kw.pop("step_quant", None)
    # full 2^16x256 tables: clamp lanes so HBM stays <= ~1 GB
    return _make_block_api(2, "s")[0](data, lanes=min(lanes, 16),
                                      step_quant=256, **kw)


def rcc2_decode(payload, n, lanes=16, **kw):
    kw.pop("step_quant", None)
    return _make_block_api(2, "s")[1](payload, n, lanes=min(lanes, 16),
                                      step_quant=256, **kw)


# ---------------------------------------------------------------------------
# W-bit symbol codecs (reference mb_o0.h n-bit tree models, mbnenc
# mb_o0.h:44-88, and the 16-bit rc of rc_.c:62-79): one W-level binary
# tree per lane (node index 1..2^W-1), MSB-first.  W in 2..16.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "W", "pred_name", "prm0",
                                              "prm1"))
def encoden_device(block: jnp.ndarray, K: int, W: int = 16,
                   pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = block.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)

    def fwd(carry, v):
        state = carry
        node = jnp.ones_like(v)
        probs, bits = [], []
        for i in range(W - 1, -1, -1):
            p = binary.clamp_p(pred.predict(state, node))
            bit = (v >> i) & 1
            state = pred.update(state, node, p, bit.astype(jnp.bool_))
            probs.append(p)
            bits.append(bit)
            node = (node << 1) | bit
        return state, (jnp.stack(probs), jnp.stack(bits))

    _, (probs, bits) = jax.lax.scan(fwd, pred.init(L, 1 << W), block.T)
    lows, freqs = binary.to_low_freq(
        probs.reshape(W * K, L), bits.reshape(W * K, L).astype(jnp.bool_))
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "W", "pred_name", "prm0",
                                              "prm1"))
def decoden_device(streams: jnp.ndarray, K: int, W: int = 16,
                   pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = streams.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)
    ans_state, pos = rans.dec_init(streams)

    def dec(carry, _):
        state, ans_state, pos = carry
        node = jnp.ones((L,), jnp.int32)
        for _i in range(W):
            p = binary.clamp_p(pred.predict(state, node))
            bit, ans_state = binary.dec_bit(ans_state, p)
            state = pred.update(state, node, p, bit)
            ans_state, pos = rans.dec_renorm(ans_state, streams, pos)
            node = (node << 1) | bit.astype(jnp.int32)
        return (state, ans_state, pos), node & ((1 << W) - 1)

    _, vals = jax.lax.scan(dec, (pred.init(L, 1 << W), ans_state, pos),
                           None, length=K)
    return vals.T


def rc16_encode(data: np.ndarray, lanes: int = 512, step_quant: int = 64,
                prm0: int = 5, prm1: int = 8, **_unused) -> bytes:
    from turborc_tpu.codecs import blockio
    pad = (-data.shape[0]) % 2
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    elems = data.view("<u2").astype(np.int32)
    block, K = blockio.shape_block_elems(elems, lanes, step_quant)
    streams, lengths = encoden_device(jnp.asarray(block), K, 16, "s", prm0,
                                      prm1)
    return blockio.pack_device(streams, lengths)


def rc16_decode(payload: bytes, n: int, lanes: int = 512,
                step_quant: int = 64, prm0: int = 5, prm1: int = 8,
                **_unused) -> np.ndarray:
    from turborc_tpu.codecs import blockio
    n_elems = -(-n // 2)
    K = blockio.K_for(n_elems, lanes, step_quant)
    streams = blockio.unpack_device(payload, lanes, 16 * K + 2)
    vals = np.asarray(decoden_device(streams, K, 16, "s", prm0, prm1))
    return vals.reshape(-1)[:n_elems].astype("<u2").view(np.uint8)[:n]


def make_nbit_block_api(W: int):
    """W-bit element codec over ints each < 2^W (reference mb_o0.h
    n-bit tree models as standalone codecs; W in 2..7 sub-byte, 10/12
    super-byte - mb_o0.h:44-248 builds the same family)."""
    from turborc_tpu.codecs import blockio
    out_dt = np.uint8 if W <= 8 else np.uint16

    def encode_block(data: np.ndarray, lanes: int = 512,
                     step_quant: int = 64, prm0: int = 5, prm1: int = 8,
                     **_unused) -> bytes:
        if data.size and int(data.max()) >= (1 << W):
            raise ValueError(f"rc{W}b input exceeds {W}-bit alphabet")
        block, K = blockio.shape_block_elems(data.astype(np.int32), lanes,
                                             step_quant)
        streams, lengths = encoden_device(jnp.asarray(block), K, W, "s",
                                          prm0, prm1)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 512,
                     step_quant: int = 64, prm0: int = 5, prm1: int = 8,
                     **_unused) -> np.ndarray:
        K = blockio.K_for(n, lanes, step_quant)
        streams = blockio.unpack_device(payload, lanes, W * K + 2)
        vals = np.asarray(decoden_device(streams, K, W, "s", prm0, prm1))
        return vals.reshape(-1)[:n].astype(out_dt)

    return encode_block, decode_block


# ---------------------------------------------------------------------------
# 32-bit bitwise coder (reference rc 32-bit o7bs, rc_.c:98-340): a 32-bit
# int as hi16 tree + lo16 tree keyed by a bitlen(hi) bucket (the
# reference's sliding bit-context plays the same role).
# ---------------------------------------------------------------------------

_RC32_BUCKETS = 5  # ceil(bitlen(hi)/4) in 0..4


@functools.partial(jax.jit, static_argnames=("K", "prm0", "prm1"))
def encode32_device(block: jnp.ndarray, K: int, prm0: int = 5,
                    prm1: int = 8):
    L = block.shape[0]
    pred = bitpred.make("s", prm0, prm1)

    def fwd(carry, v):
        shi, slo = carry
        hi = (v >> 16) & 0xFFFF
        lo = v & 0xFFFF
        probs, bits = [], []
        node = jnp.ones_like(v)
        for i in range(15, -1, -1):
            p = binary.clamp_p(pred.predict(shi, node))
            bit = (hi >> i) & 1
            shi = pred.update(shi, node, p, bit.astype(jnp.bool_))
            probs.append(p)
            bits.append(bit)
            node = (node << 1) | bit
        bl = jnp.zeros_like(v)
        for i in range(16):
            bl = bl + (hi >= (1 << i)).astype(jnp.int32)
        bucket = (bl + 3) >> 2
        node = jnp.ones_like(v)
        for i in range(15, -1, -1):
            idx = bucket * 65536 + node
            p = binary.clamp_p(pred.predict(slo, idx))
            bit = (lo >> i) & 1
            slo = pred.update(slo, idx, p, bit.astype(jnp.bool_))
            probs.append(p)
            bits.append(bit)
            node = (node << 1) | bit
        return (shi, slo), (jnp.stack(probs), jnp.stack(bits))

    init = (pred.init(L, 1 << 16), pred.init(L, _RC32_BUCKETS << 16))
    _, (probs, bits) = jax.lax.scan(fwd, init, block.T)
    lows, freqs = binary.to_low_freq(
        probs.reshape(32 * K, L), bits.reshape(32 * K, L).astype(jnp.bool_))
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "prm0", "prm1"))
def decode32_device(streams: jnp.ndarray, K: int, prm0: int = 5,
                    prm1: int = 8):
    L = streams.shape[0]
    pred = bitpred.make("s", prm0, prm1)
    ans_state, pos = rans.dec_init(streams)

    def dec(carry, _):
        shi, slo, ans_state, pos = carry
        node = jnp.ones((L,), jnp.int32)
        for _i in range(16):
            p = binary.clamp_p(pred.predict(shi, node))
            bit, ans_state = binary.dec_bit(ans_state, p)
            shi = pred.update(shi, node, p, bit)
            ans_state, pos = rans.dec_renorm(ans_state, streams, pos)
            node = (node << 1) | bit.astype(jnp.int32)
        hi = node & 0xFFFF
        bl = jnp.zeros_like(hi)
        for i in range(16):
            bl = bl + (hi >= (1 << i)).astype(jnp.int32)
        bucket = (bl + 3) >> 2
        node = jnp.ones((L,), jnp.int32)
        for _i in range(16):
            idx = bucket * 65536 + node
            p = binary.clamp_p(pred.predict(slo, idx))
            bit, ans_state = binary.dec_bit(ans_state, p)
            slo = pred.update(slo, idx, p, bit)
            ans_state, pos = rans.dec_renorm(ans_state, streams, pos)
            node = (node << 1) | bit.astype(jnp.int32)
        lo = node & 0xFFFF
        v = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
        return (shi, slo, ans_state, pos), v

    init = (pred.init(L, 1 << 16), pred.init(L, _RC32_BUCKETS << 16),
            ans_state, pos)
    _, vals = jax.lax.scan(dec, init, None, length=K)
    return vals.T


def rc32_encode(data: np.ndarray, lanes: int = 128, step_quant: int = 64,
                prm0: int = 5, prm1: int = 8, **_unused) -> bytes:
    from turborc_tpu.codecs import blockio
    pad = (-data.shape[0]) % 4
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    elems = data.view("<u4").astype(np.uint32)
    block, K = blockio.shape_block_elems(elems, lanes, step_quant,
                                         dtype=np.uint32)
    streams, lengths = encode32_device(jnp.asarray(block.view(np.int32)),
                                       K, prm0, prm1)
    return blockio.pack_device(streams, lengths)


def rc32_decode(payload: bytes, n: int, lanes: int = 128,
                step_quant: int = 64, prm0: int = 5, prm1: int = 8,
                **_unused) -> np.ndarray:
    from turborc_tpu.codecs import blockio
    n_elems = -(-n // 4)
    K = blockio.K_for(n_elems, lanes, step_quant)
    streams = blockio.unpack_device(payload, lanes, 32 * K + 2)
    vals = np.asarray(decode32_device(streams, K, prm0, prm1))
    return vals.reshape(-1)[:n_elems].astype("<u4").view(np.uint8)[:n]


# ---------------------------------------------------------------------------
# Sliding-context codec (rcx / rcx2): context length in BITS, nibble-split
# (reference mb_on.h:24-65, rc_.c:376-435).  The context slides by 4 bits
# per nibble; the hi nibble is keyed by cx, the lo nibble by (cx<<4 | hi).
# Model: per lane, [2^(cxbits+1)] rows x [16] tree slots (hi rows first).
# ---------------------------------------------------------------------------

def _fwd_nibble(pred, state, row, nib):
    probs, bits = [], []
    node = jnp.ones_like(nib)
    for i in range(3, -1, -1):
        idx = row * 16 + node
        p = binary.clamp_p(pred.predict(state, idx))
        bit = (nib >> i) & 1
        state = pred.update(state, idx, p, bit.astype(jnp.bool_))
        probs.append(p)
        bits.append(bit)
        node = (node << 1) | bit
    return state, probs, bits


def _dec_nibble(pred, state, row, ans_state, streams, pos):
    node = jnp.ones_like(row)
    for _ in range(4):
        idx = row * 16 + node
        p = binary.clamp_p(pred.predict(state, idx))
        bit, ans_state = binary.dec_bit(ans_state, p)
        state = pred.update(state, idx, p, bit)
        ans_state, pos = rans.dec_renorm(ans_state, streams, pos)
        node = (node << 1) | bit.astype(jnp.int32)
    return state, node & 0xF, ans_state, pos


@functools.partial(jax.jit, static_argnames=("K", "ctx_bits", "pred_name",
                                              "prm0", "prm1"))
def rcx_encode_device(block: jnp.ndarray, K: int, ctx_bits: int = 8,
                      pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = block.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)
    mask = (1 << ctx_bits) - 1
    U = UNROLL if K % UNROLL == 0 else 1
    cols = block.T.reshape(K // U, U, L)

    def fwd(carry, bs):
        state, cx = carry
        ps, bts = [], []
        for u in range(bs.shape[0]):
            b = bs[u]
            hi, lo = b >> 4, b & 15
            state, p1, b1 = _fwd_nibble(pred, state, cx & mask, hi)
            cx = ((cx << 4) | hi) & mask
            state, p2, b2 = _fwd_nibble(
                pred, state, (1 << ctx_bits) + (cx & mask), lo)
            cx = ((cx << 4) | lo) & mask
            ps.extend(p1 + p2)
            bts.extend(b1 + b2)
        return (state, cx), (jnp.stack(ps), jnp.stack(bts))

    init = (pred.init(L, 16 << (ctx_bits + 1)), jnp.zeros((L,), jnp.int32))
    _, (probs, bits) = jax.lax.scan(fwd, init, cols)
    probs = probs.reshape(8 * K, L)
    bits = bits.reshape(8 * K, L).astype(jnp.bool_)
    lows, freqs = binary.to_low_freq(probs, bits)
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "ctx_bits", "pred_name",
                                              "prm0", "prm1"))
def rcx_decode_device(streams: jnp.ndarray, K: int, ctx_bits: int = 8,
                      pred_name: str = "s", prm0: int = 5, prm1: int = 8):
    L = streams.shape[0]
    pred = bitpred.make(pred_name, prm0, prm1)
    ans_state, pos = rans.dec_init(streams)
    mask = (1 << ctx_bits) - 1
    U = UNROLL if K % UNROLL == 0 else 1

    def dec(carry, _):
        state, cx, ans_state, pos = carry
        outs = []
        for _u in range(U):
            state, hi, ans_state, pos = _dec_nibble(
                pred, state, cx & mask, ans_state, streams, pos)
            cx = ((cx << 4) | hi) & mask
            state, lo, ans_state, pos = _dec_nibble(
                pred, state, (1 << ctx_bits) + (cx & mask), ans_state,
                streams, pos)
            cx = ((cx << 4) | lo) & mask
            outs.append((hi << 4) | lo)
        return (state, cx, ans_state, pos), jnp.stack(outs)

    init = (pred.init(L, 16 << (ctx_bits + 1)), jnp.zeros((L,), jnp.int32),
            ans_state, pos)
    _, bytes_t = jax.lax.scan(dec, init, None, length=K // U)
    return bytes_t.reshape(K, L).T


def rcx_encode(data: np.ndarray, lanes: int = 512, step_quant: int = 256,
               prm0: int = 5, prm1: int = 8, ctx_bits: int = 8,
               **_unused) -> bytes:
    block, K = _base._shape_block(data, lanes, step_quant)
    streams, lengths = rcx_encode_device(
        jnp.asarray(block), K, ctx_bits, "s", prm0, prm1)
    return _base._pack(np.asarray(streams), np.asarray(lengths))


def rcx_decode(payload: bytes, n: int, lanes: int = 512,
               step_quant: int = 256, prm0: int = 5, prm1: int = 8,
               ctx_bits: int = 8, **_unused) -> np.ndarray:
    K = _base._K_for(n, lanes, step_quant)
    streams = _base._unpack(payload, lanes, 8 * K + 2)
    block = np.asarray(rcx_decode_device(
        jnp.asarray(streams), K, ctx_bits, "s", prm0, prm1))
    return block.astype(np.uint8).reshape(-1)[:n]
