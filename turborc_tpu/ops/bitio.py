"""Right-to-left raw bitstream - the reference's second stream end.

The reference's VLC coders run TWO streams through one output buffer:
the range-coder stream grows forward from the start while raw
(unmodeled) bits grow BACKWARD from the end (rcutil_.h:166-190
`biteinir`/`bitenormr`, used by every rcv coder, rc_.c:1026+).  Neither
side stores the boundary: the coded-stream reader starts at byte 0, the
bit reader starts at the last byte, and they never collide because the
writer laid them out tightly.

This module is the repo's R->L end.  Layout (byte-granular rather than
the reference's 64-bit-register granularity - a host/numpy-idiomatic
simplification, not a capability loss): all (value, nbits) pairs are
concatenated MSB-first into one bitstring, front-padded to a whole byte,
then stored byte-REVERSED, so a reader walking backward from the buffer
end sees the bitstring in forward order.  Both the packer and reader are
vectorized over elements; `BitPutR`/`BitGetR` are the sequential
specification the vector forms are tested against.
"""
from __future__ import annotations

import numpy as np


class BitPutR:
    """Sequential spec: append (value, nbits) MSB-first; bytes() returns
    the reversed-byte R->L buffer."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        pad = (-len(self.bits)) % 8
        arr = np.array([0] * pad + self.bits, np.uint8)
        return np.packbits(arr).tobytes()[::-1]


class BitGetR:
    """Sequential spec: read from the END of `buf` backward."""

    def __init__(self, buf: bytes, total_bits: int):
        nbytes = (total_bits + 7) // 8
        chunk = buf[len(buf) - nbytes:][::-1]
        bits = np.unpackbits(np.frombuffer(chunk, np.uint8))
        self.bits = bits[len(bits) - total_bits:]
        self.pos = 0

    def get(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


def pack_r2l(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Vectorized BitPutR: values[i]'s low nbits[i] bits, MSB-first,
    concatenated then byte-reversed."""
    values = np.asarray(values, np.uint32)
    nbits = np.asarray(nbits, np.int64)
    total = int(nbits.sum())
    if total == 0:
        return b""
    # bit j of the stream belongs to element i = searchsorted(cum, j),
    # at significance (cum[i+1]-1 - j) within values[i]
    cum = np.concatenate([[0], np.cumsum(nbits)])
    j = np.arange(total)
    i = np.searchsorted(cum, j, side="right") - 1
    sig = (cum[i + 1] - 1 - j).astype(np.uint32)
    bits = ((values[i] >> sig) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([np.zeros(pad, np.uint8), bits])
    return np.packbits(bits).tobytes()[::-1]


def unpack_r2l(buf: bytes, nbits: np.ndarray) -> np.ndarray:
    """Vectorized BitGetR: read len(nbits) values off the END of buf."""
    nbits = np.asarray(nbits, np.int64)
    total = int(nbits.sum())
    out = np.zeros(nbits.shape[0], np.uint32)
    if total == 0:
        return out
    nbytes = (total + 7) // 8
    if nbytes > len(buf):
        raise ValueError("corrupt payload: R->L bitstream underflow")
    chunk = np.frombuffer(buf[len(buf) - nbytes:], np.uint8)[::-1]
    bits = np.unpackbits(chunk)[8 * nbytes - total:].astype(np.uint32)
    cum = np.concatenate([[0], np.cumsum(nbits)])
    j = np.arange(total)
    i = np.searchsorted(cum, j, side="right") - 1
    sig = (cum[i + 1] - 1 - j).astype(np.uint32)
    np.add.at(out, i, bits[j] << sig)
    return out
