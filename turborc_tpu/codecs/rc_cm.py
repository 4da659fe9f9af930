"""Context-mixing codecs with SSE/APM refinement - the reference's
best-ratio family (rcm/rcmr/rcmrr, rccm_.c:33-172, bench ids 9/11/12).

Per bit, two (or three) predictions are linearly mixed with fixed weights,
then refined through a 17-bucket interpolated SSE table keyed by the tree
node (and a run flag for the BWT-aware variants):

    p   = (w0*p0 + w1*p1 + w2*p2) >> 4          (mbc.h:125-128, 185-202)
    j   = p >> (RC_BITS-4); frac = p & (2^(RC_BITS-4)-1)
    ssep = sse[j] + ((sse[j+1]-sse[j]) * frac >> (RC_BITS-4))
    prob = (p + 3*ssep) >> 2
    update: all mixed models + BOTH sse cells toward the coded bit
            (simple-counter updates at per-model tuned rates,
             mbc.h:156-178/224-243; rates from mbc.h PRM/PRR tables)

Variants:
  rcm  (id 9):  o1+o0 mix, weights (1,15),  sse keyed by node
  rcmr (id 11): run-aware o1+o1'+o0 mix, weights (7,7,2), sse keyed by
                (cx1==cx2)<<8 | node; second o1 view reads the ctx-before-
                previous byte (bcm-style; rccm_.c:33-79)
  rcmrr (id 12): same but run flag = (run length > 2)

The reference runs this family at RC_BITS=16; our binary-rANS core codes
15-bit probabilities, so counters/SSE run in the 15-bit domain with the
same rates (capability-equivalent, constants re-derived).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.ops import binary, rans

RC_BITS = 15
TOTAL = 1 << RC_BITS
SSE_SHIFT = RC_BITS - 4  # 11

# simple-counter rates (s predictor): mbc.h PRM1xx / PRR1xx
RATES = {
    "rcm": dict(w=(1, 15, 0), r0=2, r1=4, rs=6, run_mode=0, o2=False),
    "rcm2": dict(w=(1, 2, 13), r0=2, r1=4, rs=6, run_mode=0, o2=True),
    "rcmr": dict(w=(7, 7, 2), r0=2, r1=4, rs=6, run_mode=1, o2=False),
    "rcmrr": dict(w=(7, 7, 2), r0=2, r1=4, rs=6, run_mode=2, o2=False),
}

# rcm2's order-2 table: the reference heap-allocates 2^16 contexts x 256
# nodes (rc_.c:344-370) shared by the single stream; per-lane tables at
# that size exceed HBM budgets, so the 16-bit context is hashed down.
O2_HASH_BITS = 12


def _o2_ctx(cx1, cx2, full: bool):
    if full:  # full 2^16 contexts (reference rc_.c:344-370 heap table)
        return (cx1 << 8) | cx2
    h = (cx1 << 8) | cx2
    h = (h ^ (h >> 9)) * 0x9E5  # cheap 16->12 bit mix
    return (h >> 4) & ((1 << O2_HASH_BITS) - 1)


def _upd(p, bit, rate):
    """Simple counter update at `rate` (mbc_s.h:42 with RATE_S)."""
    b = bit.astype(jnp.int32)
    return p - (((p - (b << RC_BITS)) >> rate) + b)


def _gather(t, idx):
    return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]


def _scatter(t, idx, v):
    L = t.shape[0]
    return t.at[jnp.arange(L, dtype=jnp.int32), idx].set(v)


def _sse_init(L):
    j = np.arange(17, dtype=np.int32)
    row = (j << SSE_SHIFT) - (j == 16)
    return jnp.broadcast_to(jnp.asarray(row), (L, 512, 17)).reshape(
        L, 512 * 17)


def _predict(tabs, y, cx1, cx2, run, cfg, o2_full=False):
    mb0, mb1, mb2, sse = tabs
    w = cfg["w"]
    p0 = _gather(mb0, y)
    p1 = _gather(mb1, cx1 * 256 + y)
    if cfg["o2"]:
        i2 = _o2_ctx(cx1, cx2, o2_full) * 256 + y
        p2 = _gather(mb2, i2)
    elif w[2]:
        i2 = cx2 * 256 + y
        p2 = _gather(mb1, i2)
    else:
        i2, p2 = None, 0
    p = (w[0] * p0 + w[1] * p1 + w[2] * p2) >> 4
    j = p >> SSE_SHIFT
    frac = p & ((1 << SSE_SHIFT) - 1)
    srow = (run | y) * 17
    s0 = _gather(sse, srow + j)
    s1 = _gather(sse, srow + j + 1)
    ssep = s0 + (((s1 - s0) * frac) >> SSE_SHIFT)
    prob = binary.clamp_p((p + 3 * ssep) >> 2)
    return prob, (p0, p1, p2, i2, s0, s1, srow + j)


def _update(tabs, y, cx1, aux, bit, cfg):
    mb0, mb1, mb2, sse = tabs
    p0, p1, p2, i2, s0, s1, sj = aux
    mb0 = _scatter(mb0, y, _upd(p0, bit, cfg["r0"]))
    mb1 = _scatter(mb1, cx1 * 256 + y, _upd(p1, bit, cfg["r1"]))
    if cfg["o2"]:
        mb2 = _scatter(mb2, i2, _upd(p2, bit, cfg["r1"]))
    sse = _scatter(sse, sj, _upd(s0, bit, cfg["rs"]))
    sse = _scatter(sse, sj + 1, _upd(s1, bit, cfg["rs"]))
    return mb0, mb1, mb2, sse


def _tabs_init(L, cfg, o2_full=False):
    n2 = 1
    if cfg["o2"]:
        n2 = ((1 << 16) if o2_full else (1 << O2_HASH_BITS)) * 256
    return (jnp.full((L, 256), TOTAL // 2, jnp.int32),
            jnp.full((L, 256 * 256), TOTAL // 2, jnp.int32),
            jnp.full((L, n2), TOTAL // 2, jnp.int32),
            _sse_init(L))


def _run_ctx(run_mode, cx1, cx2, runlen):
    if run_mode == 0:
        return jnp.zeros_like(cx1)
    if run_mode == 1:
        return jnp.where(cx1 == cx2, 256, 0)
    return jnp.where(runlen > 2, 256, 0)


@functools.partial(jax.jit, static_argnames=("K", "variant", "o2_full"))
def encode_device(block: jnp.ndarray, K: int, variant: str = "rcm",
                  o2_full: bool = False):
    cfg = RATES[variant]
    L = block.shape[0]
    cols = block.T

    def fwd(carry, b):
        tabs, cx1, cx2, runlen = carry
        run = _run_ctx(cfg["run_mode"], cx1, cx2, runlen)
        node = jnp.ones_like(b)
        probs, bits = [], []
        for i in range(7, -1, -1):
            prob, aux = _predict(tabs, node, cx1, cx2, run, cfg, o2_full)
            bit = (b >> i) & 1
            tabs = _update(tabs, node, cx1, aux, bit, cfg)
            probs.append(prob)
            bits.append(bit)
            node = (node << 1) | bit
        runlen = jnp.where(b == cx1, runlen + 1, 0)
        return (tabs, b, cx1, runlen), (jnp.stack(probs), jnp.stack(bits))

    init = (_tabs_init(L, cfg, o2_full),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L,), jnp.int32),
            jnp.zeros((L,), jnp.int32))
    _, (probs, bits) = jax.lax.scan(fwd, init, cols)
    lows, freqs = binary.to_low_freq(probs.reshape(8 * K, L),
                                     bits.reshape(8 * K, L).astype(jnp.bool_))
    words, emit, st = rans.encode_backward(lows, freqs)
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "variant", "o2_full"))
def decode_device(streams: jnp.ndarray, K: int, variant: str = "rcm",
                  o2_full: bool = False):
    cfg = RATES[variant]
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)

    def dec(carry, _):
        tabs, cx1, cx2, runlen, state, pos = carry
        run = _run_ctx(cfg["run_mode"], cx1, cx2, runlen)
        node = jnp.ones_like(cx1)
        for _i in range(8):
            prob, aux = _predict(tabs, node, cx1, cx2, run, cfg, o2_full)
            bit, state = binary.dec_bit(state, prob)
            tabs = _update(tabs, node, cx1, aux, bit, cfg)
            state, pos = rans.dec_renorm(state, streams, pos)
            node = (node << 1) | bit.astype(jnp.int32)
        b = node & 0xFF
        runlen = jnp.where(b == cx1, runlen + 1, 0)
        return (tabs, b, cx1, runlen, state, pos), b

    init = (_tabs_init(L, cfg, o2_full),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L,), jnp.int32),
            jnp.zeros((L,), jnp.int32), state, pos)
    _, bytes_t = jax.lax.scan(dec, init, None, length=K)
    return bytes_t.T


def make_block_api(variant: str):
    # rcm2 holds the reference's FULL 2^16 o2 contexts when the lane
    # count keeps the table affordable (L x 16.7M x 4B; <= 16 lanes
    # -> <= 1 GB HBM), else falls back to the hashed 12-bit context
    def encode_block(data: np.ndarray, lanes: int = 128,
                     step_quant: int = 256, **_unused) -> bytes:
        block, K = blockio.shape_block(data, lanes, step_quant)
        streams, lengths = encode_device(blockio.push_u8(block), K, variant,
                                         o2_full=lanes <= 16)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 128,
                     step_quant: int = 256, **_unused) -> np.ndarray:
        K = blockio.K_for(n, lanes, step_quant)
        streams = blockio.unpack_device(payload, lanes, 8 * K + 2)
        block = blockio.fetch_u8(decode_device(streams, K, variant,
                                               o2_full=lanes <= 16))
        return block.reshape(-1)[:n]

    return encode_block, decode_block
