"""Binary (bitwise) coding on top of the lane-parallel rANS core.

The reference's bitwise range coder (turborc_.h:417-479) codes one bit with
a 15-bit probability p = P(bit=1), bit 1 owning the low interval [0, p).
We carry the identical predictor stack on a binary rANS instead: rANS is
carry-free by construction, which is what makes thousands of lanes
vectorize cleanly on the VPU (the range coder's carry walk-back
`_rccarry_` turborc_.h:103 mutates already-emitted output at data-dependent
distances - hostile to SIMD).  The reference itself ships the same design
point as `ansb` (bitwise ANS, anscdf.c:673-731, bench id 66).

Mapping of a bit to a CDF slot: bit=1 -> (low=0, freq=p);
bit=0 -> (low=p, freq=TOTAL-p).  Decode: bit = (state & MASK15) < p.
"""
from __future__ import annotations

import jax.numpy as jnp

from turborc_tpu.ops import rans

TOTAL = 1 << 15


def to_low_freq(p15: jnp.ndarray, bit: jnp.ndarray):
    """(low, freq) int32 for coding `bit` with probability p15 of bit=1."""
    low = jnp.where(bit, 0, p15)
    freq = jnp.where(bit, p15, TOTAL - p15)
    return low, freq


def dec_bit(state: jnp.ndarray, p15: jnp.ndarray):
    """Decode one bit on every lane (no renorm). Returns (bit, state')."""
    value = (state & rans.MASK15).astype(jnp.int32)
    bit = value < p15
    low, freq = to_low_freq(p15, bit)
    return bit, rans.dec_update(state, low, freq)


def clamp_p(p15: jnp.ndarray) -> jnp.ndarray:
    """Keep probabilities codeable: freq >= 1 on both branches."""
    return jnp.clip(p15, 1, TOTAL - 1)
