"""Elementwise integer transforms: delta, zigzag, xor (rcutil.c:657-733).

Applied host-side (numpy) as codec pre/post stages; all wrap modulo the
element width, so every transform is exactly invertible.
"""
from __future__ import annotations

import numpy as np


def delta_enc(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    d = np.diff(e, prepend=e.dtype.type(0))
    out = d.astype(e.dtype).view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def delta_dec(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    x = np.cumsum(e.astype(np.uint64)).astype(e.dtype)
    out = x.view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def zigzag_enc(data: np.ndarray, esize: int = 1) -> np.ndarray:
    """Signed delta -> small unsigned: (d<<1) ^ (d>>W-1) after delta."""
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    d = np.diff(e, prepend=e.dtype.type(0))
    s = d.astype(f"<i{esize}")
    z = ((s.astype(np.int64) << 1) ^ (s.astype(np.int64) >> (8 * esize - 1)))
    out = z.astype(f"<u{esize}").view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def zigzag_dec(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    z = e.astype(np.int64)
    d = (z >> 1) ^ -(z & 1)
    x = np.cumsum(d).astype(f"<u{esize}")
    out = x.view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def xor_enc(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    d = np.concatenate([e[:1], e[1:] ^ e[:-1]])
    out = d.view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def xor_dec(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    x = np.bitwise_xor.accumulate(e)
    out = x.view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def negabinary_enc(data: np.ndarray, esize: int = 1) -> np.ndarray:
    """Base -2 style signed mapping (reference negabinary, rcutil.c:657):
    v -> (v + M) ^ M with M = 0xAAAA.. interleaves signed values so small
    magnitudes of either sign get small unsigned codes."""
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    m = e.dtype.type(int("AA" * esize, 16))
    out = ((e + m) ^ m).astype(e.dtype).view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def negabinary_dec(data: np.ndarray, esize: int = 1) -> np.ndarray:
    e = data[: len(data) - len(data) % esize].view(f"<u{esize}")
    m = e.dtype.type(int("AA" * esize, 16))
    out = ((e ^ m) - m).astype(e.dtype).view(np.uint8)
    return np.concatenate([out, data[len(out):]])


def wrap_codec(enc_block, dec_block, fwd, inv, esize: int = 1):
    """Compose a transform around a block codec (zigzag/delta variants)."""

    def encode_block(data: np.ndarray, **kw) -> bytes:
        return enc_block(fwd(data, esize), **kw)

    def decode_block(payload: bytes, n: int, **kw) -> np.ndarray:
        return inv(dec_block(payload, n, **kw), esize)

    return encode_block, decode_block
