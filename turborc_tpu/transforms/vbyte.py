"""TurboByte-style group varint (reference rcv8 preprocess, vlcbyte.h
role; rc_.c:1456-1564 composes it with the rc o0 byte coder).

Byte-granular variable-length integers with the control bits grouped so
the payload stays byte-aligned and vectorizable:

  u16: groups of 8 values, one control byte (bit i set -> value i fits
       one byte), then the values' bytes little-endian, short first.
  u32: groups of 4 values, one control byte (2 bits per value: stored
       byte count - 1), then the values' bytes.

Both directions are fully vectorized (no per-value python); the encoded
stream is then handed to a byte entropy stage (codecs/registry ids
37/38), exactly the reference's composition.
"""
from __future__ import annotations

import numpy as np


def v8enc16(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype="<u2")
    n = v.shape[0]
    pad = (-n) % 8
    if pad:
        v = np.concatenate([v, np.zeros(pad, "<u2")])
    small = v < 256
    ctrl = np.packbits(small.reshape(-1, 8), axis=1, bitorder="little")
    b = v.view(np.uint8).reshape(-1, 2)  # little-endian pairs
    keep = np.ones_like(b, bool)
    keep[:, 1] = ~small
    return (np.uint32(n).tobytes() + ctrl.tobytes()
            + b[keep].tobytes())


def v8dec16(buf: bytes) -> np.ndarray:
    if len(buf) < 4:
        raise ValueError("corrupt payload: v8 header")
    n = int(np.frombuffer(buf[:4], "<u4")[0])
    ng = -(-max(n, 1) // 8) if n else 0
    ctrl = np.frombuffer(buf[4:4 + ng], np.uint8)
    if ctrl.shape[0] != ng:
        raise ValueError("corrupt payload: v8 control bytes")
    small = np.unpackbits(ctrl[:, None], axis=1,
                          bitorder="little").reshape(-1).astype(bool)
    total = n + (-n) % 8
    small = small[:total]
    sizes = np.where(small, 1, 2)
    need = int(sizes.sum())
    data = np.frombuffer(buf[4 + ng:4 + ng + need], np.uint8)
    if data.shape[0] != need:
        raise ValueError("corrupt payload: v8 data truncated")
    out = np.zeros((total, 2), np.uint8)
    ends = np.cumsum(sizes)
    out[:, 0] = data[ends - sizes]
    out[~small, 1] = data[ends[~small] - 1]
    return out.view("<u2").reshape(-1)[:n]


def v8enc32(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype="<u4")
    n = v.shape[0]
    pad = (-n) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, "<u4")])
    nb = np.ones(v.shape[0], np.uint8)  # bytes per value, 1..4
    for t in (1 << 8, 1 << 16, 1 << 24):
        nb += (v >= t).astype(np.uint8)
    g = (nb - 1).reshape(-1, 4)
    ctrl = g[:, 0] | (g[:, 1] << 2) | (g[:, 2] << 4) | (g[:, 3] << 6)
    b = v.view(np.uint8).reshape(-1, 4)
    keep = np.arange(4)[None, :] < nb[:, None]
    return (np.uint32(n).tobytes() + ctrl.astype(np.uint8).tobytes()
            + b[keep].tobytes())


def v8dec32(buf: bytes) -> np.ndarray:
    if len(buf) < 4:
        raise ValueError("corrupt payload: v8 header")
    n = int(np.frombuffer(buf[:4], "<u4")[0])
    ng = -(-max(n, 1) // 4) if n else 0
    ctrl = np.frombuffer(buf[4:4 + ng], np.uint8).astype(np.int64)
    if ctrl.shape[0] != ng:
        raise ValueError("corrupt payload: v8 control bytes")
    total = n + (-n) % 4
    g = np.stack([ctrl & 3, (ctrl >> 2) & 3, (ctrl >> 4) & 3,
                  (ctrl >> 6) & 3], axis=1).reshape(-1)[:total]
    sizes = g + 1
    need = int(sizes.sum())
    data = np.frombuffer(buf[4 + ng:4 + ng + need], np.uint8)
    if data.shape[0] != need:
        raise ValueError("corrupt payload: v8 data truncated")
    out = np.zeros((total, 4), np.uint8)
    starts = np.cumsum(sizes) - sizes
    for k in range(4):
        m = sizes > k
        out[m, k] = data[starts[m] + k]
    return out.view("<u4").reshape(-1)[:n]
