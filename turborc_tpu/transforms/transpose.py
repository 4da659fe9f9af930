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


def tpenc_nd(data: np.ndarray, dims: tuple, esize: int) -> np.ndarray:
    """N-D variant (transpose.h tp3d/tp4d): byte planes over a dims grid."""
    n = int(np.prod(dims)) * esize
    body = data[:n].reshape(tuple(dims) + (esize,))
    perm = (len(dims),) + tuple(range(len(dims)))
    out = np.ascontiguousarray(body.transpose(perm)).reshape(-1)
    return np.concatenate([out, data[n:]])


def tpdec_nd(data: np.ndarray, dims: tuple, esize: int) -> np.ndarray:
    n = int(np.prod(dims)) * esize
    body = data[:n].reshape((esize,) + tuple(dims))
    perm = tuple(range(1, len(dims) + 1)) + (0,)
    out = np.ascontiguousarray(body.transpose(perm)).reshape(-1)
    return np.concatenate([out, data[n:]])


def tp4enc(data: np.ndarray, esize: int = 2) -> np.ndarray:
    """Nibble transpose (reference tp4 build of transpose_.c): records
    split into 2*esize nibble planes, planes packed back into bytes."""
    n = data.shape[0] - data.shape[0] % esize
    recs = data[:n].reshape(-1, esize)
    # [nrec, 2*esize] nibbles -> planes [2*esize, nrec] -> flat
    nibs = np.stack([recs >> 4, recs & 15], axis=2).reshape(-1, 2 * esize)
    flat = nibs.T.reshape(-1)  # 2n nibbles
    packed = ((flat[0::2] << 4) | flat[1::2]).astype(np.uint8)
    return np.concatenate([packed, data[n:]])


def tp4dec(data: np.ndarray, esize: int = 2) -> np.ndarray:
    n = data.shape[0] - data.shape[0] % esize
    packed = data[:n]
    flat = np.empty(2 * n, np.uint8)
    flat[0::2] = packed >> 4
    flat[1::2] = packed & 15
    nibs = flat.reshape(2 * esize, -1).T.reshape(-1, esize, 2)
    recs = ((nibs[:, :, 0] << 4) | nibs[:, :, 1]).astype(np.uint8)
    return np.concatenate([recs.reshape(-1), data[n:]])


# ---------------------------------------------------------------------------
# rcutil small utilities: histogram, run scan, bit-plane pack
# (histcalc8 rcutil.c:529, memrun8/16 rcutil_.h:109-122, bitenc rcutil.c:599)
# ---------------------------------------------------------------------------

def histogram(data: np.ndarray) -> np.ndarray:
    """Byte histogram (histcalc8 role)."""
    return np.bincount(data.reshape(-1), minlength=256)


def memrun(data: np.ndarray) -> int:
    """Length of the leading run of identical bytes (memrun8 role)."""
    if data.shape[0] == 0:
        return 0
    diff = np.nonzero(data != data[0])[0]
    return int(diff[0]) if diff.size else data.shape[0]


def bitenc(data: np.ndarray, width: int) -> np.ndarray:
    """Pack the low `width` bits of each element into a dense bitstream
    (bit-plane pack, bitenc rcutil.c:599).  LSB-first within bytes."""
    vals = data.astype(np.uint64) & ((1 << width) - 1)
    bits = ((vals[:, None] >> np.arange(width, dtype=np.uint64)) & 1)
    return np.packbits(bits.reshape(-1).astype(np.uint8), bitorder="little")


def bitdec(packed: np.ndarray, width: int, count: int) -> np.ndarray:
    bits = np.unpackbits(packed, bitorder="little")[:count * width]
    vals = bits.reshape(count, width).astype(np.uint64)
    return (vals << np.arange(width, dtype=np.uint64)).sum(axis=1)
