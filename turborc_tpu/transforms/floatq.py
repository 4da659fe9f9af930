"""Float preprocessing: linear quantization and lossy mantissa truncation.

Reference: fpquant*e* (rcutil.c:909-936), fprazor (rcutil.c:958-1012),
error stats fpstat (rcutil.c:752).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class QuantParams:
    lo: float
    scale: float
    bits: int


def fpquant_enc(x: np.ndarray, bits: int = 16):
    """Linear quantize floats to unsigned ints of `bits` (lossy)."""
    x = np.asarray(x, np.float64)
    lo, hi = float(x.min()) if x.size else 0.0, float(x.max()) if x.size \
        else 0.0
    span = hi - lo
    scale = ((1 << bits) - 1) / span if span > 0 else 0.0
    q = np.round((x - lo) * scale).astype(
        np.uint32 if bits > 16 else (np.uint16 if bits > 8 else np.uint8))
    return q, QuantParams(lo, scale, bits)


def fpquant_dec(q: np.ndarray, p: QuantParams) -> np.ndarray:
    if p.scale == 0.0:
        return np.full(q.shape, p.lo, np.float64)
    return q.astype(np.float64) / p.scale + p.lo


def fprazor(x: np.ndarray, keep_mantissa_bits: int) -> np.ndarray:
    """Zero low mantissa bits of f32 values (lossy, improves ratio)."""
    x = np.asarray(x, np.float32)
    drop = 23 - keep_mantissa_bits
    if drop <= 0:
        return x.copy()
    u = x.view(np.uint32)
    # round-to-nearest at the truncation point
    half = np.uint32(1 << (drop - 1))
    mask = np.uint32(~((1 << drop) - 1) & 0xFFFFFFFF)
    out = ((u + half) & mask)
    return out.view(np.float32)


def fpstat(orig: np.ndarray, approx: np.ndarray) -> dict:
    """Error statistics (reference fpstat role)."""
    orig = np.asarray(orig, np.float64)
    approx = np.asarray(approx, np.float64)
    err = orig - approx
    denom = float(np.square(orig).sum()) or 1.0
    return dict(
        max_abs=float(np.abs(err).max()) if err.size else 0.0,
        mse=float(np.square(err).mean()) if err.size else 0.0,
        psnr_db=float(10 * np.log10(
            (np.square(orig).max() or 1.0) /
            (np.square(err).mean() or 1e-300))) if err.size else 0.0,
        nrmse=float(np.sqrt(np.square(err).sum() / denom)),
    )
