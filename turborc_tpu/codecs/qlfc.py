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
        run lengths -> adaptive gamma coder (codecs/intcodecs), the
        reference's own choice for QLFC runs (rcqlfc_.c:74); element
        width 16/32-bit picked from the block's max run and recorded
        in the payload (runs-1 are mostly 0 on BWT text - gamma's
        single zero-flag symbol beats the VLC nibble machinery ~4x).

Payload: u64 m (run count) + u32 len(rank payload) + u8 run element
size + u8 rank stage id (0 = per-lane CDF16, 1 = share-span s8) +
rank payload + run-length payload.  The share-span stage wins on
low-run data at scale but loses its striding cost on runny data
(BENCH_REAL_r02.json), so the encoder picks per block from the average
run length and records the choice.
"""
from __future__ import annotations

import struct

import numpy as np

from turborc_tpu.codecs import intcodecs, rans_cdf_o0, rans_cdf_s8
from turborc_tpu.host import native

_RUN_API = {2: intcodecs.make_block_api("gamma", 2),
            4: intcodecs.make_block_api("gamma", 4)}

# rank-stream stage: the share-span codec pays fixed warm-table overhead
# and strides runs across lanes - a win at scale, a loss on small blocks
_S8_MIN = 1 << 20


def _lanes_for(m: int, lanes: int) -> int:
    """Scale the lane count to the run count: small blocks want LONG
    per-lane streams (the adaptive models pay a per-lane warm-up ramp
    and a 2-word flush), large blocks want the full lane parallelism.
    Targets >= ~256 elements per lane; both sides derive it from m,
    which rides in the payload header."""
    want = 1 << max(5, (m // 256).bit_length())
    return max(32, min(lanes, want))


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
    # share-span stage only at scale AND on low-run data (its strided
    # format pays ~6% on the rank stream when runs are long)
    big = m >= _S8_MIN and data.shape[0] < 2.5 * m
    stage = rans_cdf_s8 if big else rans_cdf_o0
    lanes_eff = lanes if big else _lanes_for(m, lanes)
    rank_pay = stage.encode_block(ranks, lanes=lanes_eff,
                                  step_quant=step_quant)
    # run lengths as (runlen - 1), element width from the max run
    esz = 2 if (m == 0 or int(runlens.max()) - 1 < (1 << 16)) else 4
    rl = (runlens - 1).astype(f"<u{esz}").view(np.uint8)
    run_pay = _RUN_API[esz][0](rl, lanes=_lanes_for(m, lanes),
                               step_quant=step_quant)
    return (struct.pack("<QIBB", m, len(rank_pay), esz, int(big))
            + rank_pay + run_pay)


def decode_block(payload: bytes, n: int, lanes: int = 2048,
                 step_quant: int = 64, **_unused) -> np.ndarray:
    if len(payload) < 14:
        raise ValueError("corrupt payload: truncated qlfc header")
    m, rank_len, esz, big = struct.unpack_from("<QIBB", payload)
    if esz not in _RUN_API or big > 1:
        raise ValueError("corrupt payload: bad qlfc header fields")
    if n == 0:
        return np.zeros(0, np.uint8)
    body = payload[14:]
    stage = rans_cdf_s8 if big else rans_cdf_o0
    lanes_eff = lanes if big else _lanes_for(m, lanes)
    ranks = stage.decode_block(bytes(body[:rank_len]), m,
                               lanes=lanes_eff, step_quant=step_quant)
    rl = _RUN_API[esz][1](bytes(body[rank_len:]), esz * m,
                          lanes=_lanes_for(m, lanes),
                          step_quant=step_quant)
    runlens = rl.view(f"<u{esz}").astype(np.int64) + 1
    if runlens.sum() != n:
        raise ValueError("corrupt payload: qlfc run lengths do not sum")
    heads = native.unmtf(ranks)
    return np.repeat(heads, runlens)
