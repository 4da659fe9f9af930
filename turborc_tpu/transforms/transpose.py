"""Byte transpose ("shuffle"): SoA layout for multi-byte records.

Reference: transpose.c/transpose_.c (scalar + SSE/AVX2 builds, 2D/3D/4D,
API include_/transpose.h:36-60).  On TPU this is just a reshape+transpose
that XLA lays out efficiently; host-side numpy does the same for the CLI
path.  Splitting records into byte planes makes slowly-varying high bytes
compressible by the order-0/RLE stages.
"""
from __future__ import annotations

import numpy as np


def tpenc(data: np.ndarray, esize: int) -> np.ndarray:
    """[n] bytes of n/esize records -> esize byte planes, concatenated."""
    n = data.shape[0] - data.shape[0] % esize
    head = data[:n].reshape(-1, esize).T.reshape(-1)
    return np.concatenate([head, data[n:]])


def tpdec(data: np.ndarray, esize: int) -> np.ndarray:
    n = data.shape[0] - data.shape[0] % esize
    head = data[:n].reshape(esize, -1).T.reshape(-1)
    return np.concatenate([head, data[n:]])


def tpenc2d(data: np.ndarray, rows: int, cols: int, esize: int):
    """2D variant (transpose.h tp2d*): planes within a rows x cols grid."""
    body = data[:rows * cols * esize].reshape(rows, cols, esize)
    out = np.ascontiguousarray(body.transpose(2, 0, 1)).reshape(-1)
    return np.concatenate([out, data[rows * cols * esize:]])


def tpdec2d(data: np.ndarray, rows: int, cols: int, esize: int):
    body = data[:rows * cols * esize].reshape(esize, rows, cols)
    out = np.ascontiguousarray(body.transpose(1, 2, 0)).reshape(-1)
    return np.concatenate([out, data[rows * cols * esize:]])
