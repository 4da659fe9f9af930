"""Shared host-side block shaping, lane-stream packing, and warm-start
CDF16 table construction."""
from __future__ import annotations

import numpy as np

TOTAL = 1 << 15


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """[..., 16] counts -> freq rows summing 2^15 with freq >= 1."""
    c = counts.astype(np.int64) + 1
    n = c.sum(axis=-1, keepdims=True)
    f = np.maximum(1, c * (TOTAL - 16) // n)
    idx = np.argmax(c, axis=-1)
    np.put_along_axis(f, idx[..., None],
                      np.take_along_axis(f, idx[..., None], -1)
                      + TOTAL - f.sum(axis=-1, keepdims=True), -1)
    return f.astype(np.uint16)


def nibble_tables(data: np.ndarray):
    """(hi freqs [16], lo freqs [16,16]) from a block's nibbles -
    warm-start statistics for the adaptive CDF16 models."""
    hi, lo = data >> 4, data & 15
    hi_f = quantize_freqs(np.bincount(hi, minlength=16))
    joint = np.bincount((hi.astype(np.int32) << 4) | lo, minlength=256)
    lo_f = quantize_freqs(joint.reshape(16, 16))
    return hi_f, lo_f


def cumulative(freqs: np.ndarray) -> np.ndarray:
    """freq rows [..., 16] -> cumulative cdf rows (cdf[0] = 0) int32."""
    cdf = np.zeros(freqs.shape, np.int32)
    cdf[..., 1:] = np.cumsum(freqs, axis=-1)[..., :-1].astype(np.int32)
    return cdf


def K_for(n: int, lanes: int, step_quant: int) -> int:
    """Per-lane symbol count: ceil(n/lanes) padded to step_quant (>= 1 step)."""
    K = -(-n // lanes)
    return max(-(-K // step_quant) * step_quant, step_quant)


def shape_block(data: np.ndarray, lanes: int, step_quant: int):
    """Pad + reshape flat bytes into [lanes, K] contiguous chunks."""
    n = data.shape[0]
    K = K_for(n, lanes, step_quant)
    padded = np.zeros(lanes * K, np.uint8)
    padded[:n] = data
    return padded.reshape(lanes, K).astype(np.int32), K


def shape_block_elems(elems: np.ndarray, lanes: int, step_quant: int,
                      dtype=np.int32):
    """Pad + reshape an integer element array into [lanes, K] chunks."""
    n = elems.shape[0]
    K = K_for(n, lanes, step_quant)
    padded = np.zeros(lanes * K, dtype)
    padded[:n] = elems
    return padded.reshape(lanes, K), K


def pack(streams: np.ndarray, lengths: np.ndarray) -> bytes:
    """[L, M] word matrix + [L] lengths -> payload bytes."""
    if lengths.max() > 0xFFFF:
        raise ValueError("lane stream exceeds u16 length field")
    keep = np.arange(streams.shape[1])[None, :] < lengths[:, None]
    flat = streams[keep].astype(np.uint16)
    return lengths.astype("<u2").tobytes() + flat.astype("<u2").tobytes()


def unpack(payload: bytes, lanes: int, M: int) -> np.ndarray:
    """payload -> [lanes, M] int32 word matrix (zero padded)."""
    if len(payload) < 2 * lanes:
        raise ValueError("corrupt payload: truncated lane length table")
    lengths = np.frombuffer(payload[:2 * lanes], "<u2").astype(np.int64)
    flat = np.frombuffer(payload[2 * lanes:len(payload) & ~1], "<u2")
    if lengths.max() > M or lengths.min() < 2 or lengths.sum() != flat.size:
        raise ValueError("corrupt payload: lane length table inconsistent")
    streams = np.zeros((lanes, M), np.int32)
    keep = np.arange(M)[None, :] < lengths[:, None]
    streams[keep] = flat
    return streams
