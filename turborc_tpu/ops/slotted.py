"""Slotted binary coding: variable-length symbol codes in a fixed-shape world.

Integer coders (gamma / rice / VLC / RLE / u3) emit a data-dependent number
of binary decisions per symbol.  On TPU every lane must take the same
number of steps, so each symbol gets a FIXED number of coding slots; a slot
is (model index, bit, active).  Inactive slots cost compute but produce no
output bits (rans.encode_backward skips them), so the compressed size is
identical to the reference's sequential formulation.

ModelTable is the simple one-counter predictor (mbc_s.h semantics) over a
flat per-lane table with masked update; Recorder collects encode-side slots;
Decoder plays them back against the lane streams.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from turborc_tpu.ops import binary, rans

RC_BITS = 15
TOTAL = 1 << RC_BITS


class ModelTable:
    """[L, N] simple adaptive bit models with masked gather/scatter."""

    def __init__(self, L: int, N: int, rate: int = 5):
        self.N = N
        self.rate = rate
        self.t = jnp.full((L, N), TOTAL // 2, jnp.int32)

    def tree(self):
        return self.t

    @staticmethod
    def from_state(t, rate: int = 5):
        m = object.__new__(ModelTable)
        m.N = t.shape[1]
        m.rate = rate
        m.t = t
        return m

    def predict(self, idx):
        idx = jnp.clip(idx, 0, self.N - 1)
        return binary.clamp_p(
            jnp.take_along_axis(self.t, idx[:, None], axis=1)[:, 0])

    def update(self, idx, p, bit, active):
        idx = jnp.clip(idx, 0, self.N - 1)
        bit_i = bit.astype(jnp.int32)
        newp = p - (((p - (bit_i << RC_BITS)) >> self.rate) + bit_i)
        newp = jnp.where(active, newp, p)
        L = self.t.shape[0]
        self.t = self.t.at[jnp.arange(L, dtype=jnp.int32), idx].set(newp)


class Recorder:
    """Encode side: collect (prob, bit, active) slots during the model scan."""

    def __init__(self):
        self.probs, self.bits, self.valids = [], [], []

    def code(self, model: ModelTable, idx, bit, active):
        p = model.predict(idx)
        self.probs.append(p)
        self.bits.append(bit.astype(jnp.bool_))
        self.valids.append(active.astype(jnp.bool_))
        model.update(idx, p, bit, active)

    def code_raw(self, bit, active):
        """Model-free bit at fixed p=1/2: costs exactly 1 output bit."""
        self.probs.append(jnp.full_like(bit, TOTAL // 2, jnp.int32))
        self.bits.append(bit.astype(jnp.bool_))
        self.valids.append(active.astype(jnp.bool_))

    def slots(self):
        """-> (probs [S,L], bits, valids) stacked in slot order."""
        return (jnp.stack(self.probs), jnp.stack(self.bits),
                jnp.stack(self.valids))


class Decoder:
    """Decode side: sequential masked bit reads against lane streams."""

    def __init__(self, state, pos, streams):
        self.state = state
        self.pos = pos
        self.streams = streams

    def read(self, model: ModelTable, idx, active):
        p = model.predict(idx)
        bit, new_state = binary.dec_bit(self.state, p)
        bit = jnp.logical_and(bit, active)
        new_state = jnp.where(active, new_state, self.state)
        ren_state, ren_pos = rans.dec_renorm(new_state, self.streams,
                                             self.pos)
        self.state = jnp.where(active, ren_state, new_state)
        self.pos = jnp.where(active, ren_pos, self.pos)
        model.update(idx, p, bit, active)
        return bit

    def read_raw(self, active):
        """Model-free bit at fixed p=1/2."""
        p = jnp.full_like(self.pos, TOTAL // 2)
        bit, new_state = binary.dec_bit(self.state, p)
        bit = jnp.logical_and(bit, active)
        new_state = jnp.where(active, new_state, self.state)
        ren_state, ren_pos = rans.dec_renorm(new_state, self.streams,
                                             self.pos)
        self.state = jnp.where(active, ren_state, new_state)
        self.pos = jnp.where(active, ren_pos, self.pos)
        return bit

    def carry(self):
        return self.state, self.pos


def finish_encode(rec: Recorder):
    """Recorder -> (streams, lengths) via the backward pass + stitch."""
    probs, bits, valids = rec.slots()
    lows, freqs = binary.to_low_freq(probs, bits)
    words, emit, st = rans.encode_backward(lows, freqs, valids)
    return rans.stitch(words, emit, st)


def bitlen(v: jnp.ndarray, width: int) -> jnp.ndarray:
    """floor(log2(v)) + 1 for v >= 1, 0 for v == 0 (compare-count form).

    The threshold literal must be typed: a bare python ``1 << 31``
    overflows JAX's int32 scalar canonicalization at width=32."""
    acc = jnp.zeros_like(v)
    for k in range(width):
        acc = acc + (v >= v.dtype.type(1 << k)).astype(v.dtype)
    return acc
