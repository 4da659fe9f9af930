"""Turbo-VLC integer codecs over adaptive CDF16 exponents + rANS direct bits.

Reference counterparts: the VLC-over-CDF integer coders of the CDF range
coder (rccdf_.h:80-122, rccdf.c:326-654, bench ids 48-53) and their rANS
twins (anscdf_.h:185-230, anscdf.c:139-483, ids 60-63): an integer is split
into a small *exponent* coded with an adaptive nibble CDF and a *mantissa*
of raw bits.  The reference pushes mantissa bits through a separate
right-to-left bitstream (vlcbit.h:24-37); the TPU-native design instead
codes them as rANS **direct bits** - a single (low = mant << (15-n),
freq = 1 << (15-n)) slot per <=15-bit chunk (turborc_.h:355-401 is the
range-coder version of the same trick) - so exponent and mantissa ride one
lane stream and every element compiles to a tiny fixed slot count with no
masking:

    W=8  (vnibble, ids 48/49): 1 CDF slot + 1 direct slot
    W=16 (ids 50/51, 60/61):   1 CDF slot + 1 direct slot
    W=32 (ids 52/53, 62/63):   2 CDF slots + 3 direct slots

Exponent scheme: s = bitlen(x >> 3), i.e. x < 8 -> s=0 with a 3-bit
mantissa; otherwise x in [2^(s+2), 2^(s+3)) with an (s+2)-bit mantissa
(leading 1 dropped).  s fits one nibble for W<=16; W=32 codes s as a
hi/lo CDF16 pair (hi selects one of two lo tables).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans

RC_BITS = 15
TOTAL = 1 << RC_BITS


def _bitlen_u32(v: jnp.ndarray, width: int) -> jnp.ndarray:
    """floor(log2(v))+1 for v>=1 else 0, v uint32, compare-count form."""
    acc = jnp.zeros(v.shape, jnp.int32)
    for k in range(width):
        acc = acc + (v >= jnp.uint32(1 << k)).astype(jnp.int32)
    return acc


def _split(x: jnp.ndarray, W: int, vb: int = 3):
    """x [L] uint32 -> (s exponent, mant uint32, m mantissa bits).

    vb is the VLC base (reference vlcbit.h VN6-VN16 parameterization):
    values below 2^vb get exponent 0 with a vb-bit mantissa; otherwise
    s = bitlen(x >> vb) and the mantissa has s+vb-1 bits."""
    s = _bitlen_u32(x >> vb, max(W - vb, 1))
    m = jnp.where(s == 0, vb, s + vb - 1)
    base = jnp.where(s == 0, jnp.uint32(0),
                     jnp.left_shift(jnp.uint32(1 << vb),
                                    jnp.maximum(s - 1, 0).astype(jnp.uint32)))
    return s, x - base, m


def _join(s: jnp.ndarray, mant: jnp.ndarray, vb: int = 3):
    base = jnp.where(s == 0, jnp.uint32(0),
                     jnp.left_shift(jnp.uint32(1 << vb),
                                    jnp.maximum(s - 1, 0).astype(jnp.uint32)))
    return base + mant


def _chunk_lens(m: jnp.ndarray, W: int):
    """Mantissa bit budget -> up to 3 chunk lengths of <= 15 bits each."""
    c1 = jnp.minimum(m, 15)
    if W <= 16:
        return (c1,)
    rem = m - c1
    c2 = jnp.minimum(rem, 15)
    return c1, c2, rem - c2


def _dbits_low_freq(chunk: jnp.ndarray, n: jnp.ndarray):
    """Direct-bits slot: n raw bits (0<=n<=15) as one rANS symbol."""
    sh = (15 - n).astype(jnp.uint32)
    low = (chunk.astype(jnp.uint32) << sh).astype(jnp.int32)
    freq = (jnp.uint32(1) << sh).astype(jnp.int32)
    return low, freq


def _slots_per_elem(W: int) -> int:
    return 2 if W <= 16 else 5


@functools.partial(jax.jit, static_argnames=("K", "W", "vb"))
def encode_device(block: jnp.ndarray, K: int, W: int, vb: int = 3):
    """block [L, K] uint32 elements -> (streams, lengths)."""
    L = block.shape[0]
    cols = block.T  # [K, L]
    two_stage = W > 16

    def fwd(carry, x):
        s, mant, m = _split(x, W, vb)
        lows, freqs = [], []
        if two_stage:
            cdf_hi, cdf_lo = carry
            hi, lo = s >> 4, s & 15
            low_h, fr_h = cdf16.lookup(cdf_hi, hi)
            cdf_hi = cdf16.update(cdf_hi, low_h)
            sel = jax.nn.one_hot(hi, 2, dtype=cdf_lo.dtype)
            row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            low_l, fr_l = cdf16.lookup(row, lo)
            cdf_lo = cdf_lo + (cdf16.update(row, low_l) - row)[:, None, :] \
                * sel[:, :, None]
            lows += [low_h, low_l]
            freqs += [fr_h, fr_l]
            carry = (cdf_hi, cdf_lo)
        else:
            cdf = carry
            low_s, fr_s = cdf16.lookup(cdf, s)
            carry = cdf16.update(cdf, low_s)
            lows.append(low_s)
            freqs.append(fr_s)
        lens = _chunk_lens(m, W)
        rem = mant
        shift = m
        for n in lens:
            shift = shift - n
            chunk = (rem >> shift.astype(jnp.uint32)) & \
                ((jnp.uint32(1) << n.astype(jnp.uint32)) - 1)
            lo_d, fr_d = _dbits_low_freq(chunk, n)
            lows.append(lo_d)
            freqs.append(fr_d)
        return carry, (jnp.stack(lows), jnp.stack(freqs))

    init = (cdf16.init((L,)), cdf16.init((L, 2))) if two_stage \
        else cdf16.init((L,))
    _, (lows, freqs) = jax.lax.scan(fwd, init, cols)
    S = K * _slots_per_elem(W)
    words, emit, st = rans.encode_backward(lows.reshape(S, L),
                                           freqs.reshape(S, L))
    return rans.stitch(words, emit, st)


@functools.partial(jax.jit, static_argnames=("K", "W", "vb"))
def decode_device(streams: jnp.ndarray, K: int, W: int, vb: int = 3):
    L = streams.shape[0]
    state, pos = rans.dec_init(streams)
    two_stage = W > 16

    def read_cdf(cdf, state, pos):
        value = (state & rans.MASK15).astype(jnp.int32)
        sym, low, freq = cdf16.search(cdf, value)
        state = rans.dec_update(state, low, freq)
        state, pos = rans.dec_renorm(state, streams, pos)
        return sym, low, state, pos

    def read_dbits(n, state, pos):
        sh = (15 - n).astype(jnp.uint32)
        chunk = (state & rans.MASK15) >> sh
        low, freq = _dbits_low_freq(chunk, n)
        state = rans.dec_update(state, low, freq)
        state, pos = rans.dec_renorm(state, streams, pos)
        return chunk, state, pos

    def dec(carry, _):
        if two_stage:
            cdf_hi, cdf_lo, state, pos = carry
            hi, low_h, state, pos = read_cdf(cdf_hi, state, pos)
            cdf_hi = cdf16.update(cdf_hi, low_h)
            sel = jax.nn.one_hot(hi, 2, dtype=cdf_lo.dtype)
            row = jnp.sum(cdf_lo * sel[:, :, None], axis=1)
            lo, low_l, state, pos = read_cdf(row, state, pos)
            cdf_lo = cdf_lo + (cdf16.update(row, low_l) - row)[:, None, :] \
                * sel[:, :, None]
            s = (hi << 4) | lo
        else:
            cdf, state, pos = carry
            s, low_s, state, pos = read_cdf(cdf, state, pos)
            cdf = cdf16.update(cdf, low_s)
        m = jnp.where(s == 0, vb, s + vb - 1)
        mant = jnp.zeros((L,), jnp.uint32)
        for n in _chunk_lens(m, W):
            chunk, state, pos = read_dbits(n, state, pos)
            mant = (mant << n.astype(jnp.uint32)) | chunk
        x = _join(s, mant, vb)
        carry = (cdf_hi, cdf_lo, state, pos) if two_stage \
            else (cdf, state, pos)
        return carry, x

    init = ((cdf16.init((L,)), cdf16.init((L, 2)), state, pos) if two_stage
            else (cdf16.init((L,)), state, pos))
    _, vals = jax.lax.scan(dec, init, None, length=K)
    return vals.T  # [L, K] uint32


# ---------------------------------------------------------------------------
# host block API
# ---------------------------------------------------------------------------

def _to_elems_u(data: np.ndarray, esize: int) -> np.ndarray:
    if esize == 1:
        return data.astype(np.uint32)
    pad = (-data.shape[0]) % esize
    if pad:
        data = np.concatenate([data, np.zeros(pad, np.uint8)])
    return data.view(f"<u{esize}").astype(np.uint32)


def _shape_u(elems: np.ndarray, lanes: int, step_quant: int):
    n = elems.shape[0]
    K = blockio.K_for(n, lanes, step_quant)
    padded = np.zeros(lanes * K, np.uint32)
    padded[:n] = elems
    return padded.reshape(lanes, K), K


def make_block_api(esize: int, vb: int = 3):
    """(encode_block, decode_block) for VLC elements of `esize` bytes.
    vb selects the VLC base (reference VN6-VN16 sweep)."""
    W = 8 * esize

    def encode_block(data: np.ndarray, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> bytes:
        block, K = _shape_u(_to_elems_u(data, esize), lanes, step_quant)
        streams, lengths = encode_device(jnp.asarray(block), K, W, vb)
        return blockio.pack_device(streams, lengths)

    def decode_block(payload: bytes, n: int, lanes: int = 512,
                     step_quant: int = 64, **_unused) -> np.ndarray:
        n_elems = -(-n // esize)
        K = blockio.K_for(n_elems, lanes, step_quant)
        M = _slots_per_elem(W) * K + 2
        streams = blockio.unpack_device(payload, lanes, M)
        vals = np.asarray(decode_device(streams, K, W, vb))
        flat = vals.reshape(-1)[:n_elems]
        if esize == 1:
            return flat.astype(np.uint8)[:n]
        return flat.astype(f"<u{esize}").view(np.uint8)[:n]

    return encode_block, decode_block
