"""True range-coder core with carry propagation - the reference's L1 coder.

The reference's central coder (turborc_.h:103-159 `_rcenorm_`/`_rccarry_`,
:417-476 `rcbe_`/`rcbd_`) is a carry-WITH range coder: 64-bit range/low,
32-bit renormalization I/O, 15-bit probabilities, and a carry walk-back
that increments already-emitted output words when `low` wraps
(`_rccarry_`: while(!++*--p)).  Round 1 deliberately substituted a
carry-free binary rANS (ops/binary.py); this module adds the genuine RC
core so reference RC streams can be produced and consumed bit-exactly
(tests/golden/rcs_*.stream are raw `rcsenc` outputs of the reference
binary; the scalar spec and the lane-parallel coder both match them
byte-for-byte).

Layout decisions (all fixed by the reference's compiled configuration,
rc_s.c:32 RC_BITS=15 + turborc_.h:41-58 RC_SIZE=64 default -> RC_IO=32):

  * state: range/low/ilow uint64, output in little-endian 32-bit words
  * renorm: `if (range < 2^32) { carry-fix; put(low>>32); low<<=32;
    range<<=32; ilow=low }` - a single `if`, not a loop (RC_IO=32)
  * carry detect: `ilow > low` (low only grows between renorms; a wrap
    past 2^64 is the carry) - fixed by incrementing emitted words
    right-to-left while they overflow to zero
  * bit coding (p = P(bit=1), 15-bit): rcx = (range>>15)*p;
    bit1 -> range=rcx; bit0 -> low+=rcx, range-=rcx
  * flush: renorm, then 1 word if range > 2^33 (low += 2^32) else
    2 words (low += 1)
  * decoder primes `code` with two words and renorms by the same
    schedule; no carry logic needed on the decode side

TPU mapping: the carry walk-back mutates already-emitted output - a
data-dependent backwards loop no SIMD/XLA program should express.  The
lane-parallel coder therefore emits (word, carry-flag) pairs from the
jitted scan and resolves carries in a single host post-pass per lane
(`_apply_carries`); decode is carry-free and runs fully on device.
Renormalization points are NOT data-dependent (the `if` fires on a
schedule fixed by the bit index - see `_RCENORM2` gating, mb_o0.h:28-42:
with RC_SIZE=64/IO=32/BITS=15 renorm happens before tree steps 0,2,4,6),
so the scan is fixed-shape.
"""
from __future__ import annotations

import functools

import numpy as np

MASK64 = (1 << 64) - 1
MASK32 = (1 << 32) - 1
RC_BITS = 15
PROB_INIT = 1 << (RC_BITS - 1)
# renorm before tree steps 0,2,4,6 of each byte (mb_o0.h RCENORM gating:
# (64-32)/2 >= 15 -> step odd renorms elided; (64-32)/4 < 15 -> every
# second step renorms)
RENORM_STEPS = (0, 2, 4, 6)


# ---------------------------------------------------------------------------
# scalar golden spec (exact reference semantics, python ints)
# ---------------------------------------------------------------------------

class RangeEncoder:
    """Scalar spec of the reference encoder state machine."""

    def __init__(self):
        self.low = 0
        self.ilow = 0
        self.range = MASK64
        self.words: list[int] = []

    def _carry(self):
        if self.ilow > self.low:  # low wrapped past 2^64 since last renorm
            i = len(self.words) - 1
            while True:
                self.words[i] = (self.words[i] + 1) & MASK32
                if self.words[i]:
                    break
                i -= 1

    def renorm(self):
        if self.range < (1 << 32):
            self._carry()
            self.words.append((self.low >> 32) & MASK32)
            self.low = (self.low << 32) & MASK64
            self.range = (self.range << 32) & MASK64
            self.ilow = self.low

    def encode_bit(self, p: int, bit: int):
        """Code one bit with 15-bit P(bit=1)=p.  Caller renorms per the
        fixed schedule (RENORM_STEPS within a byte)."""
        rcx = (self.range >> RC_BITS) * p
        if bit:
            self.range = rcx
        else:
            self.low = (self.low + rcx) & MASK64
            self.range -= rcx

    def flush(self) -> bytes:
        self.renorm()
        if self.range > (1 << 33):
            self.low = (self.low + (1 << 32)) & MASK64
            self._carry()
            self.words.append((self.low >> 32) & MASK32)
        else:
            self.low = (self.low + 1) & MASK64
            self._carry()
            self.words.append((self.low >> 32) & MASK32)
            self.words.append(self.low & MASK32)
        return np.asarray(self.words, dtype="<u4").tobytes()


class RangeDecoder:
    """Scalar spec of the reference decoder state machine."""

    def __init__(self, stream: bytes):
        pad = (-len(stream)) % 4 + 8  # slack: decoder may read past flush
        self.words = np.frombuffer(stream + b"\0" * pad, dtype="<u4")
        self.range = MASK64
        self.code = (int(self.words[0]) << 32) | int(self.words[1])
        self.pos = 2

    def renorm(self):
        if self.range < (1 << 32):
            self.range = (self.range << 32) & MASK64
            self.code = ((self.code << 32) | int(self.words[self.pos])) \
                & MASK64
            self.pos += 1

    def decode_bit(self, p: int) -> int:
        rcx = (self.range >> RC_BITS) * p
        self.range -= rcx
        if self.code < rcx:
            self.range = rcx
            return 1
        self.code -= rcx
        return 0


def _update(p: int, bit: int) -> int:
    """Simple predictor update (mbc_s.h:53-55), 16-bit wraparound exact."""
    return (p - (((p - (bit << RC_BITS)) >> 5) + bit)) & 0xFFFF


def spec_encode(data: np.ndarray) -> bytes:
    """o0 byte-tree encode - byte-exact twin of reference `rcsenc`
    (rc_.c:47-59 + mb8enc, mb_o0.h:89-99)."""
    enc = RangeEncoder()
    mb = np.full(256, PROB_INIT, np.int32)
    for x in np.asarray(data, np.uint8):
        node = 1
        xx = 0x100 | int(x)
        for i in range(8):
            if i in RENORM_STEPS:
                enc.renorm()
            p = int(mb[node])
            bit = (xx >> (7 - i)) & 1
            enc.encode_bit(p, bit)
            mb[node] = _update(p, bit)
            node = (node << 1) | bit
    return enc.flush()


def spec_decode(stream: bytes, n: int) -> np.ndarray:
    """o0 byte-tree decode - twin of reference `rcsdec` (rc_.c:37-45)."""
    dec = RangeDecoder(stream)
    mb = np.full(256, PROB_INIT, np.int32)
    out = np.empty(n, np.uint8)
    for k in range(n):
        node = 1
        for i in range(8):
            if i in RENORM_STEPS:
                dec.renorm()
            p = int(mb[node])
            bit = dec.decode_bit(p)
            mb[node] = _update(p, bit)
            node = (node << 1) | bit
        out[k] = node & 0xFF
    return out


def spec_encode_sf(data: np.ndarray, tables) -> bytes:
    """o0 byte-tree encode under the FSM predictor - byte-exact twin of
    reference `rcsfenc` (rc_sf.c + mbc_sf.h:44-50: p = fsm[s].p, next
    state fsm[s].s[bit]; every tree node starts in state 0).  `tables`
    = (prob, next0, next1) from models.fsm.load_reference_table or
    build_table."""
    prob, nxt0, nxt1 = tables
    enc = RangeEncoder()
    mb = np.zeros(256, np.int32)  # state ids (mbu_probinit() = 0)
    for x in np.asarray(data, np.uint8):
        node = 1
        xx = 0x100 | int(x)
        for i in range(8):
            if i in RENORM_STEPS:
                enc.renorm()
            s = int(mb[node])
            bit = (xx >> (7 - i)) & 1
            enc.encode_bit(int(prob[s]), bit)
            mb[node] = nxt1[s] if bit else nxt0[s]
            node = (node << 1) | bit
    return enc.flush()


def spec_decode_sf(stream: bytes, n: int, tables) -> np.ndarray:
    """Twin of reference `rcsfdec` (see spec_encode_sf)."""
    prob, nxt0, nxt1 = tables
    dec = RangeDecoder(stream)
    mb = np.zeros(256, np.int32)
    out = np.empty(n, np.uint8)
    for k in range(n):
        node = 1
        for i in range(8):
            if i in RENORM_STEPS:
                dec.renorm()
            s = int(mb[node])
            bit = dec.decode_bit(int(prob[s]))
            mb[node] = nxt1[s] if bit else nxt0[s]
            node = (node << 1) | bit
        out[k] = node & 0xFF
    return out


# ---------------------------------------------------------------------------
# lane-parallel device coder
# ---------------------------------------------------------------------------
#
# Each lane runs its own 64-bit RC state over its own [K]-byte column and
# emits into its own word row.  Emission uses drop-mode scatter (position
# parked out of range when the renorm doesn't fire); carries ride out as
# a parallel flag array and are resolved on the host (`_apply_carries`).

def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _enc_device_fn(K: int, W: int, sf=None):
    """sf = optional (prob, next0, next1) FSM arrays: the per-node cell
    then holds a state id gathered through the shared table instead of a
    direct probability (mbc_sf.h vs mbc_s.h - same RC core)."""
    jax, jnp = _jx()

    @functools.partial(jax.jit, static_argnums=())
    def run(block):  # [L, K] uint8 -> words [L, W] u32, flags, npos, tail
        with jax.enable_x64(True):
            L = block.shape[0]
            lanes = jnp.arange(L)
            u64 = jnp.uint64

            def renorm(st, bufs):
                rng, low, ilow, pos = st
                words, flags = bufs
                need = rng < jnp.uint64(1 << 32)
                carry = need & (ilow > low)
                at = jnp.where(need, pos, W)  # W -> dropped
                words = words.at[lanes, at].set(
                    (low >> jnp.uint64(32)).astype(jnp.uint32), mode="drop")
                flags = flags.at[lanes, at].set(carry, mode="drop")
                low = jnp.where(need, low << jnp.uint64(32), low)
                rng = jnp.where(need, rng << jnp.uint64(32), rng)
                ilow = jnp.where(need, low, ilow)
                pos = pos + need.astype(jnp.int32)
                return (rng, low, ilow, pos), (words, flags)

            def enc_bit(st, p, bit):
                rng, low, ilow, pos = st
                rcx = (rng >> jnp.uint64(RC_BITS)) * p.astype(u64)
                b = bit.astype(jnp.bool_)
                rng = jnp.where(b, rcx, rng - rcx)
                low = jnp.where(b, low, low + rcx)
                return (rng, low, ilow, pos)

            if sf is not None:
                prob_t, nxt0_t, nxt1_t = (jnp.asarray(a) for a in sf)

            def step(carry, col):
                st, mb, words, flags = carry
                node = jnp.ones_like(col, jnp.int32)
                xx = 0x100 | col.astype(jnp.int32)
                for i in range(8):
                    if i in RENORM_STEPS:
                        st, (words, flags) = renorm(st, (words, flags))
                    cell = mb[lanes, node]
                    p = prob_t[cell] if sf is not None else cell
                    bit = (xx >> (7 - i)) & 1
                    if sf is not None:
                        newc = jnp.where(bit.astype(jnp.bool_),
                                         nxt1_t[cell], nxt0_t[cell])
                    else:
                        newc = (p - (((p - (bit << RC_BITS)) >> 5) + bit)) \
                            & 0xFFFF
                    st = enc_bit(st, p, bit)
                    mb = mb.at[lanes, node].set(newc)
                    node = (node << 1) | bit
                return (st, mb, words, flags), None

            st = (jnp.full((L,), MASK64, u64), jnp.zeros((L,), u64),
                  jnp.zeros((L,), u64), jnp.zeros((L,), jnp.int32))
            mb = jnp.full((L, 256), 0 if sf is not None else PROB_INIT,
                          jnp.int32)
            words = jnp.zeros((L, W), jnp.uint32)
            flags = jnp.zeros((L, W), jnp.bool_)
            (st, mb, words, flags), _ = jax.lax.scan(
                step, (st, mb, words, flags), block.T)

            # flush (reference rceflush, turborc_.h:135-147)
            rng, low, ilow, pos = st
            st, (words, flags) = renorm(st, (words, flags))
            rng, low, ilow, pos = st
            one_word = rng > jnp.uint64(1 << 33)
            low = low + jnp.where(one_word, jnp.uint64(1 << 32),
                                  jnp.uint64(1))
            fcarry = ilow > low
            at = pos
            words = words.at[lanes, at].set(
                (low >> jnp.uint64(32)).astype(jnp.uint32), mode="drop")
            flags = flags.at[lanes, at].set(fcarry, mode="drop")
            at = jnp.where(one_word, W, pos + 1)
            words = words.at[lanes, at].set(low.astype(jnp.uint32),
                                            mode="drop")
            pos = pos + jnp.where(one_word, 1, 2)
            return words, flags, pos

    return run


def _dec_device_fn(K: int, sf=None):
    jax, jnp = _jx()

    @functools.partial(jax.jit, static_argnums=())
    def run(streams):  # [L, W] u32 words -> [L, K] uint8
        with jax.enable_x64(True):
            L, W = streams.shape
            lanes = jnp.arange(L)
            u64 = jnp.uint64
            code = (streams[:, 0].astype(u64) << jnp.uint64(32)) \
                | streams[:, 1].astype(u64)
            rng = jnp.full((L,), MASK64, u64)
            pos = jnp.full((L,), 2, jnp.int32)
            mb0 = jnp.full((L, 256), 0 if sf is not None else PROB_INIT,
                           jnp.int32)
            if sf is not None:
                prob_t, nxt0_t, nxt1_t = (jnp.asarray(a) for a in sf)

            def renorm(rng, code, pos):
                need = rng < jnp.uint64(1 << 32)
                nxt = streams[lanes, jnp.minimum(pos, W - 1)].astype(u64)
                rng = jnp.where(need, rng << jnp.uint64(32), rng)
                code = jnp.where(need, (code << jnp.uint64(32)) | nxt, code)
                pos = pos + need.astype(jnp.int32)
                return rng, code, pos

            def step(carry, _):
                rng, code, pos, mb = carry
                node = jnp.ones((L,), jnp.int32)
                for i in range(8):
                    if i in RENORM_STEPS:
                        rng, code, pos = renorm(rng, code, pos)
                    cell = mb[lanes, node]
                    p = prob_t[cell] if sf is not None else cell
                    rcx = (rng >> jnp.uint64(RC_BITS)) * p.astype(u64)
                    rng = rng - rcx
                    bit = (code < rcx).astype(jnp.int32)
                    rng = jnp.where(bit, rcx, rng)
                    code = jnp.where(bit, code, code - rcx)
                    if sf is not None:
                        newc = jnp.where(bit.astype(jnp.bool_),
                                         nxt1_t[cell], nxt0_t[cell])
                    else:
                        newc = (p - (((p - (bit << RC_BITS)) >> 5) + bit)) \
                            & 0xFFFF
                    mb = mb.at[lanes, node].set(newc)
                    node = (node << 1) | bit
                return (rng, code, pos, mb), (node & 0xFF).astype(jnp.uint8)

            _, cols = jax.lax.scan(step, (rng, code, pos, mb0), None,
                                   length=K)
            return cols.T

    return run


def _apply_carries(words: np.ndarray, flags: np.ndarray,
                   npos: np.ndarray) -> np.ndarray:
    """Resolve recorded carries: flag at slot k means 'increment the word
    stream ending at k-1' with 0xFFFFFFFF-propagation - the walk-back the
    reference does in-place at emit time (turborc_.h `_rccarry_`)."""
    words = words.copy()
    for lane, slot in zip(*np.nonzero(flags)):
        if slot >= npos[lane]:
            continue
        j = slot - 1
        while True:
            w = (int(words[lane, j]) + 1) & MASK32
            words[lane, j] = w
            if w:
                break
            j -= 1
    return words


def encode_lanes(block: np.ndarray, sf=None):
    """Encode [L, K] byte columns -> (words [L, W] u32, lengths [L]).
    sf = optional FSM predictor tables (prob, next0, next1)."""
    L, K = block.shape
    W = (K * 10) // 32 + 4  # worst case ~2 words/byte is unreachable;
    # expansion tops out near 10 bits/byte on adversarial data
    jax, jnp = _jx()
    words, flags, npos = _enc_device_fn(K, W, sf)(jnp.asarray(block))
    words = np.asarray(words)
    flags = np.asarray(flags)
    npos = np.asarray(npos)
    if int(npos.max(initial=0)) >= W:
        raise ValueError("rc stream overflow")  # unreachable by design
    return _apply_carries(words, flags, npos), npos


def decode_lanes(streams: np.ndarray, K: int, sf=None) -> np.ndarray:
    """Decode [L, W] u32 word rows -> [L, K] bytes."""
    jax, jnp = _jx()
    return np.asarray(_dec_device_fn(K, sf)(jnp.asarray(streams)))
