"""Lane-parallel rANS core.

Reference semantics (anscdf_.h:33-103): 32-bit state, 16-bit renorm I/O,
RC_BITS=15 probabilities, state lower bound ANS_LOW=1<<15.

  encode step (ece, anscdf_.h:90-94):
      if state >= freq << 16: emit low 16 bits, state >>= 16
      state = (state / freq) << 15 + (state % freq) + cdf_low
  decode step (cdf16ansdec + ecdnorm, cdf_.h:52-59, anscdf_.h:50-72):
      value = state & 0x7FFF ; find sym with cdf[sym] <= value < cdf[sym+1]
      state = freq * (state >> 15) + value - cdf_low
      if state < ANS_LOW: state = state << 16 | next_u16

The reference interleaves 4 states (anscdf.c:566) to hide the serial
dependency from a superscalar CPU.  The TPU-native design interleaves
THOUSANDS of lanes: every lane is an independent rANS state + model, all
lanes step together as one vectorized scan, and per-lane byte streams are
compacted afterwards with a cumsum + scatter (fixed shapes, XLA friendly).

Encoding is two-pass exactly like the reference (anscdf_.h:106-138): a
forward model pass produces (cdf_low, freq) per symbol, then a backward
coding pass emits the streams.  On TPU both passes are lax.scans.

Stream layout per lane: [state_hi16, state_lo16, renorm words in forward-
decode order].  The decoder reads words left to right, which is the exact
reverse of encode-time emission order (rANS LIFO property).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ANS_BITS = 15
ANS_LOW = np.uint32(1 << 15)
MASK15 = np.uint32((1 << 15) - 1)
MASK16 = np.uint32((1 << 16) - 1)


def enc_step(state: jnp.ndarray, low: jnp.ndarray, freq: jnp.ndarray):
    """One vectorized rANS encode step over all lanes.

    state [L] uint32; low/freq [L] int32 (0 <= low, 1 <= freq <= 32768).
    Returns (state', word, emit) - word is the renorm u16 (as uint32),
    emit marks lanes that actually emitted this step.
    """
    fr = freq.astype(jnp.uint32)
    emit = state >= (fr << 16)
    word = state & MASK16
    state = jnp.where(emit, state >> 16, state)
    q = state // fr
    state = (q << ANS_BITS) + (state - q * fr) + low.astype(jnp.uint32)
    return state, word, emit


def dec_update(state: jnp.ndarray, low: jnp.ndarray, freq: jnp.ndarray):
    """State transition after the symbol search (no renorm)."""
    value = state & MASK15
    return (freq.astype(jnp.uint32) * (state >> ANS_BITS)
            + value - low.astype(jnp.uint32))


def dec_renorm(state: jnp.ndarray, streams: jnp.ndarray, pos: jnp.ndarray):
    """Vectorized renorm: lanes with state < ANS_LOW consume one u16.

    streams [L, M] int32 (each entry one u16 word), pos [L] int32.
    """
    need = state < ANS_LOW
    word = jnp.take_along_axis(streams, pos[:, None], axis=1)[:, 0]
    state = jnp.where(need, (state << 16) | word.astype(jnp.uint32), state)
    pos = pos + need.astype(jnp.int32)
    return state, pos


def encode_backward(lows: jnp.ndarray, freqs: jnp.ndarray,
                    valid: jnp.ndarray | None = None,
                    init_state: jnp.ndarray | None = None):
    """Backward coding pass over precomputed per-symbol probabilities.

    lows/freqs [S, L] int32, symbol-time major (s ascending = decode order).
    `valid` [S, L] bool marks real coding slots; invalid slots are no-ops
    (used by variable-length symbol codecs that pad to a fixed slot count).
    `init_state` [L] uint32 (>= ANS_LOW) seeds the encoder states - the
    decoder recovers them as its final states, so up to 16 payload bits
    per lane ride along for free (state seeding).
    Returns (words [S, L], emit [S, L], state [L]) with words/emit indexed
    by symbol time s.
    """
    L = lows.shape[1]
    init = (jnp.full((L,), ANS_LOW, jnp.uint32) if init_state is None
            else init_state.astype(jnp.uint32))

    if valid is None:
        def body(state, inp):
            low, freq = inp
            state, word, emit = enc_step(state, low, freq)
            return state, (word, emit)

        state, (words, emit) = jax.lax.scan(
            body, init, (lows, freqs), reverse=True)
        return words, emit, state

    def body(state, inp):
        low, freq, v = inp
        new_state, word, emit = enc_step(state, low, jnp.maximum(freq, 1))
        state = jnp.where(v, new_state, state)
        emit = jnp.logical_and(emit, v)
        return state, (word, emit)

    state, (words, emit) = jax.lax.scan(
        body, init, (lows, freqs, valid), reverse=True)
    return words, emit, state


def stitch(words: jnp.ndarray, emit: jnp.ndarray, state: jnp.ndarray):
    """Compact per-step emissions into per-lane streams.

    words/emit [S, L]; state [L] uint32 (final, flushed as 2 words).
    Returns (streams [L, S+2] int32, lengths [L] int32) - lengths in u16
    words including the 2 flush words.
    """
    S, L = words.shape
    M = S + 2
    # forward-decode-order position of each emission
    pos = 2 + jnp.cumsum(emit.astype(jnp.int32), axis=0) - emit.astype(jnp.int32)
    lane = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (S, L))
    posc = jnp.where(emit, pos, M)  # out-of-range -> dropped
    out = jnp.zeros((L, M), jnp.int32)
    out = out.at[lane.ravel(), posc.ravel()].set(
        words.astype(jnp.int32).ravel(), mode="drop")
    out = out.at[:, 0].set((state >> 16).astype(jnp.int32))
    out = out.at[:, 1].set((state & MASK16).astype(jnp.int32))
    lengths = 2 + jnp.sum(emit.astype(jnp.int32), axis=0)
    return out, lengths


def dec_init(streams: jnp.ndarray):
    """Read the 2 flush words per lane -> (state [L] uint32, pos [L])."""
    state = (streams[:, 0].astype(jnp.uint32) << 16) | \
        streams[:, 1].astype(jnp.uint32)
    pos = jnp.full((streams.shape[0],), 2, jnp.int32)
    return state, pos


# ----------------------------------------------------------------------------
# Scalar executable spec (single lane, python ints) - golden model for tests
# ----------------------------------------------------------------------------

class ScalarEncoder:
    """Single-lane rANS encoder mirroring the vectorized semantics."""

    def __init__(self):
        self.pending = []  # (low, freq) in forward symbol order

    def put(self, low: int, freq: int):
        self.pending.append((low, freq))

    def flush(self) -> list[int]:
        """Run the backward pass; return u16 words in forward-decode order."""
        state = int(ANS_LOW)
        words_rev = []  # emission order (= reverse decode order)
        for low, freq in reversed(self.pending):
            if state >= (freq << 16):
                words_rev.append(state & 0xFFFF)
                state >>= 16
            q, r = divmod(state, freq)
            state = (q << ANS_BITS) + r + low
        words = [state >> 16, state & 0xFFFF]
        words.extend(reversed(words_rev))
        return words


class ScalarDecoder:
    """Single-lane rANS decoder over a u16 word list."""

    def __init__(self, words):
        self.words = list(words)
        self.state = (self.words[0] << 16) | self.words[1]
        self.pos = 2

    def value(self) -> int:
        return self.state & 0x7FFF

    def advance(self, low: int, freq: int):
        value = self.state & 0x7FFF
        self.state = freq * (self.state >> ANS_BITS) + value - low
        if self.state < int(ANS_LOW):
            self.state = (self.state << 16) | self.words[self.pos]
            self.pos += 1
