"""QLFC - quantized local frequency coding (reference rcqlfc_.c, id 18).

The reference's best fast BWT entropy stage: run-split the BWT output
into (MTF rank of each run head, run length), then entropy-code both
streams with context-adaptive integer models (rcqlfc_.c:58-79 codes rank
and run with gamma models keyed by per-symbol RICEK EMAs).

TPU-native redesign:
  host: run split (numpy) + MTF over run heads (host/qlfc.cpp) - the MTF
        recursion is inherently sequential (SURVEY.md section 7 hard
        part 6), everything downstream is lane-parallel.
  TPU:  rank bytes  -> adaptive CDF16 nibble-pair rANS with share-span
        models (codecs/rans_cdf_s8) - the adaptivity carries the
        context role of the reference's RICEK(K[u]) gamma contexts
        (measured: static conditional entropy of ranks is ~19-23% of
        input while the reference hits 27.7% TOTAL only through
        adaptation, bench notes round 2).
        run lengths -> Turbo-VLC exponent/mantissa over adaptive CDF16
        (codecs/rans_vlc, W=32), matching the reference's gamma-coded
        runs (rcqlfc_.c:74).

Payload: u64 m (run count) + u32 len(rank payload) + rank payload +
run-length payload.
"""
from __future__ import annotations

import struct

import numpy as np

from turborc_tpu.codecs import rans_cdf_o0, rans_cdf_s8, rans_vlc
from turborc_tpu.host import native

_RUN_ENC, _RUN_DEC = rans_vlc.make_block_api(4)

# rank-stream stage: the share-span codec pays fixed warm-table overhead
# and strides runs across lanes - a win at scale, a loss on small blocks
_S8_MIN = 1 << 20


def run_split(data: np.ndarray):
    """(heads, runlens) of maximal equal-byte runs."""
    n = data.shape[0]
    if n == 0:
        return data, np.zeros(0, np.int64)
    change = np.flatnonzero(np.diff(data.astype(np.int16)) != 0)
    starts = np.concatenate([[0], change + 1])
    runlens = np.diff(np.concatenate([starts, [n]]))
    return data[starts], runlens


def encode_block(data: np.ndarray, lanes: int = 2048,
                 step_quant: int = 64, **_unused) -> bytes:
    heads, runlens = run_split(data)
    m = heads.shape[0]
    ranks = native.mtf(heads)
    big = m >= _S8_MIN
    stage = rans_cdf_s8 if big else rans_cdf_o0
    rank_pay = stage.encode_block(ranks, lanes=lanes,
                                  step_quant=step_quant)
    # run lengths as (runlen - 1), little-endian u32 elements
    rl = (runlens - 1).astype("<u4").view(np.uint8)
    run_pay = _RUN_ENC(rl, lanes=lanes, step_quant=step_quant)
    return (struct.pack("<QI", m, len(rank_pay)) + rank_pay + run_pay)


def decode_block(payload: bytes, n: int, lanes: int = 2048,
                 step_quant: int = 64, **_unused) -> np.ndarray:
    if len(payload) < 12:
        raise ValueError("corrupt payload: truncated qlfc header")
    m, rank_len = struct.unpack_from("<QI", payload)
    if n == 0:
        return np.zeros(0, np.uint8)
    body = payload[12:]
    stage = rans_cdf_s8 if m >= _S8_MIN else rans_cdf_o0
    ranks = stage.decode_block(bytes(body[:rank_len]), m,
                               lanes=lanes, step_quant=step_quant)
    rl = _RUN_DEC(bytes(body[rank_len:]), 4 * m, lanes=lanes,
                  step_quant=step_quant)
    runlens = rl.view("<u4").astype(np.int64) + 1
    if runlens.sum() != n:
        raise ValueError("corrupt payload: qlfc run lengths do not sum")
    heads = native.unmtf(ranks)
    return np.repeat(heads, runlens)
