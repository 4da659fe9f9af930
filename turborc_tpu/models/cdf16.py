"""Adaptive CDF16 probability model - the natural TPU primitive.

Semantics follow the reference's SIMD adaptive CDF (cdf_.h:46-107): a
16-entry cumulative table per context, searched and updated with pure
element-wise 16-wide integer math, which maps 1:1 onto VPU sublanes.

Representation: we store entries cdf[0..15] (cdf[0] is pinned at 0 by the
update dynamics - see cdf_.h:26, init j<<(RC_BITS-4)); the implicit
cdf[16] == 1<<RC_BITS == 32768 closes the table.  freq(x) = cdf[x+1]-cdf[x].

Update rule (cdf_.h:46-50, AVX2 form, signed 16-bit lanes):

    mask_i = cdf_i > cdf_x            (value compare against coded symbol)
    cdf_i += (i*IC - cdf_i + mask_i*MIXD) >> CDFRATE    (arithmetic shift)

which mixes the table toward a staircase: ~0 below the coded symbol's slot
and ~MIXD above it, at rate 1/2^CDFRATE.  All quantities provably stay in
[0, 32767] so int32 math reproduces the 16-bit SIMD arithmetic exactly.

One deliberate divergence from the reference: we re-impose *strict*
monotonicity (cdf_{i+1} >= cdf_i + 1) after every update via a 16-wide
prefix-max.  The reference's dynamics can collapse a never-seen symbol's
frequency to zero (making it unencodable); our repair guarantees freq >= 1
for every symbol while being the identity on healthy tables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RC_BITS = 15
TOTAL = 1 << RC_BITS  # 32768
CDFRATE = int(__import__("os").environ.get("TRC_CDFRATE", "7"))  # cdf_.h:25
#   (env override is an EXPERIMENT knob: the rate is format-relevant,
#    so production payloads pin the default; see bench/rate_probe.py)
IC = 10               # cdf_.h:35
MIXD = (TOTAL - 1) & ~((1 << 5) - 1)  # 32736, cdf_.h:36

# staircase mixing target base: i*IC for i in 0..15
_CRV = np.arange(16, dtype=np.int32) * IC


def init(shape=()) -> jnp.ndarray:
    """Fresh table(s): cdf[j] = j << (RC_BITS-4), shape [..., 16] int32."""
    base = (np.arange(16, dtype=np.int32) << (RC_BITS - 4))
    return jnp.broadcast_to(jnp.asarray(base), tuple(shape) + (16,))


def init_np(shape=()) -> np.ndarray:
    base = (np.arange(16, dtype=np.int32) << (RC_BITS - 4))
    return np.broadcast_to(base, tuple(shape) + (16,)).copy()


def _repair(cdf: jnp.ndarray) -> jnp.ndarray:
    """Strictly-increasing projection: cdf_i = max_{j<=i}(cdf_j - j) + i.

    Identity on already strictly increasing tables.  log2(16)=4 shifted-max
    steps; runs entirely on the VPU.
    """
    i16 = jnp.arange(16, dtype=cdf.dtype)
    d = cdf - i16
    # prefix max over the last axis (16 entries) via doubling shifts
    for s in (1, 2, 4, 8):
        shifted = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(s, 0)])[..., :16]
        mask = i16 >= s
        d = jnp.where(mask, jnp.maximum(d, shifted), d)
    return d + i16


def lookup(cdf: jnp.ndarray, sym: jnp.ndarray):
    """(cdf_low, freq) for symbol sym.  cdf [...,16] int32, sym [...] int32.

    Gather-free: 16-wide one-hot contraction (VPU friendly).
    """
    sel = jax.nn.one_hot(sym, 16, dtype=cdf.dtype)
    nxt = jnp.concatenate(
        [cdf[..., 1:], jnp.full(cdf.shape[:-1] + (1,), TOTAL, cdf.dtype)], -1)
    low = jnp.sum(cdf * sel, axis=-1)
    freq = jnp.sum(nxt * sel, axis=-1) - low
    return low, freq


def update(cdf: jnp.ndarray, low: jnp.ndarray) -> jnp.ndarray:
    """Adapt after coding a symbol whose cdf value is `low` (== cdf[sym]).

    cdf [...,16] int32, low [...] int32 broadcast over the entry axis.
    """
    return update_rate(cdf, low, CDFRATE)


def update_rate(cdf: jnp.ndarray, low: jnp.ndarray, rate: int) -> jnp.ndarray:
    """`update` with an explicit adaptation rate (cdf_.h's CDFRATE knob).

    Rates < 7 can push the top entries past TOTAL (the staircase target
    tops out at 15*IC + MIXD = 32886 > 32767 and equilibrium is within
    2^rate of it), so the repaired table is also clamped from above to
    keep freq >= 1 for the top symbols.
    """
    mask = cdf > low[..., None]
    crv = jnp.asarray(_CRV, cdf.dtype)
    tgt = crv - cdf + jnp.where(mask, MIXD, 0)
    return clamp_top(_repair(cdf + (tgt >> rate)))


def delta(cdf: jnp.ndarray, low: jnp.ndarray) -> jnp.ndarray:
    """Single-symbol update delta: (staircase target - cdf) >> CDFRATE.
    `update(cdf, low)` == repair(cdf + delta(cdf, low))."""
    mask = cdf > low[..., None]
    crv = jnp.asarray(_CRV, cdf.dtype)
    return (crv - cdf + jnp.where(mask, MIXD, 0)) >> CDFRATE


def update_batch(cdf: jnp.ndarray, lows: list) -> jnp.ndarray:
    """One model update absorbing k coded symbols at once (their cdf
    values `lows`, all against the pre-step table).  Sums the per-symbol
    shifted deltas: to first order in k*2^-CDFRATE this equals k
    sequential updates, but the per-symbol deltas are independent - in
    the TPU kernel k lanes each compute their own delta and a log2(k)
    butterfly reduction applies them all, keeping the k table copies in
    sync."""
    d = jnp.zeros_like(cdf)
    for low in lows:
        d = d + delta(cdf, low)
    return clamp_top(_repair(cdf + d))


def clamp_top(cdf: jnp.ndarray) -> jnp.ndarray:
    """Upper strict-monotone clamp: cdf_i <= TOTAL-16+i, so freq >= 1 at
    the top of the table.  Needed whenever the per-step movement exceeds
    the single rate-7 update (batched updates, faster rates): the
    staircase target's top is 15*IC + MIXD = 32886 > TOTAL."""
    cap = jnp.asarray(np.arange(16, dtype=np.int32) + TOTAL - 16, cdf.dtype)
    return jnp.minimum(cdf, cap)


def search(cdf: jnp.ndarray, value: jnp.ndarray):
    """Decode-side symbol search: sym = (first i with cdf_i > value) - 1.

    value = state & (TOTAL-1).  Returns (sym, cdf_low, freq).
    """
    gt = cdf > value[..., None]
    # count of entries <= value, minus the always-<= entry 0
    sym = 15 - jnp.sum(gt.astype(jnp.int32), axis=-1)
    low, freq = lookup(cdf, sym)
    return sym, low, freq


# ----------------------------------------------------------------------------
# Scalar numpy executable spec (golden model for kernel tests)
# ----------------------------------------------------------------------------

def update_np(cdf: np.ndarray, sym: int) -> None:
    """In-place scalar update, one 16-entry table."""
    low = int(cdf[sym])
    mask = cdf > low
    cdf += (_CRV - cdf + np.where(mask, MIXD, 0)) >> CDFRATE
    # strict monotone repair
    d = cdf - np.arange(16, dtype=np.int32)
    np.maximum.accumulate(d, out=d)
    cdf[:] = d + np.arange(16, dtype=np.int32)


def lookup_np(cdf: np.ndarray, sym: int):
    low = int(cdf[sym])
    high = TOTAL if sym == 15 else int(cdf[sym + 1])
    return low, high - low


def search_np(cdf: np.ndarray, value: int) -> int:
    sym = 0
    while sym < 15 and value >= cdf[sym + 1]:
        sym += 1
    return sym
