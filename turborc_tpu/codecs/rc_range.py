"""`rc-rc` (registry id 5): order-0 byte codec over the TRUE range-coder
core (ops/rangecoder.py) - the reference's L1 coder with carry
propagation, not the rANS substitute the rest of the repo rides.

Capability row: SURVEY §2.1 / reference turborc_.h:103-159.  At
lanes=1 the payload is BIT-IDENTICAL to the reference binary's `rcsenc`
output (rc_.c:47-59); tests/golden/rcs_*.stream assert that parity in
CI.  Multi-lane framing: [L] u32 word counts, then each lane's words
(little-endian u32), concatenated.

This codec exists for capability/parity, not speed: like the other
bitwise-tree scan codecs it is gather-bound on TPU (VERDICT weak #4);
the fast path for 8-bit symbols remains the rANS kernel flagships.
"""
from __future__ import annotations

import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.ops import rangecoder


def encode_block(data: np.ndarray, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> bytes:
    data = np.asarray(data, np.uint8)
    if lanes == 1:
        # parity mode: raw reference-compatible stream, no framing
        block = data[None, :]
        words, npos = rangecoder.encode_lanes(block)
        return words[0, : int(npos[0])].astype("<u4").tobytes()
    block, K = blockio.shape_block(data, lanes, step_quant)
    words, npos = rangecoder.encode_lanes(block.astype(np.uint8))
    keep = np.arange(words.shape[1])[None, :] < npos[:, None]
    return (npos.astype("<u4").tobytes()
            + words[keep].astype("<u4").tobytes())


def decode_block(payload: bytes, n: int, lanes: int = 512,
                 step_quant: int = 256, **_unused) -> np.ndarray:
    if lanes == 1:
        pad = (-len(payload)) % 4 + 8
        words = np.frombuffer(payload + b"\0" * pad, "<u4")
        return rangecoder.decode_lanes(words[None, :].copy(), n)[0]
    K = blockio.K_for(n, lanes, step_quant)
    if len(payload) < 4 * lanes:
        raise ValueError("corrupt payload: truncated rc length table")
    npos = np.frombuffer(payload[: 4 * lanes], "<u4").astype(np.int64)
    flat = np.frombuffer(payload[4 * lanes: len(payload) & ~3], "<u4")
    if npos.min() < 2 or npos.sum() != flat.size:
        raise ValueError("corrupt payload: rc length table inconsistent")
    W = int(npos.max()) + 2  # +2: decoder renorm slack past flush
    streams = np.zeros((lanes, W), np.uint32)
    streams[np.arange(W)[None, :] < npos[:, None]] = flat
    block = rangecoder.decode_lanes(streams, K)
    return block.reshape(-1)[:n]
