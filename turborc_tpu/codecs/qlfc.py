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


# ---------------------------------------------------------------------------
# qlfc2: context-sorted QLFC on the flagship kernel (round 4).
#
# The reference's rcqlfc (rcqlfc_.c:58-100) beats a context-free stage by
# ~1.2x because every rank/run is coded under a context (symbol u = the
# MTF front, RICEK of a per-symbol EMA).  Those contexts are sequential -
# hostile to lane-parallel decode - but they are DETERMINISTIC given the
# previously decoded elements.  qlfc2 therefore:
#
#   encode: backward-MTF ranks (native.qlfc2_ranks, the reference's own
#     construction so the decoder's MTF front is the coded symbol) ->
#     compute every element's context (native.qlfc2_ctx) -> STABLE-SORT
#     ranks and runs by context -> code the sorted streams with the
#     flagship Pallas codec, whose 1024 contiguous share-span adaptive
#     models specialize per context bucket (measured 3.01 MB for the
#     rank stream on 16MB textbwt vs 3.69 order-0 - the full reference
#     context gain, with zero kernel changes).
#   decode: both kernel decodes run lane-parallel FIRST, then a single
#     sequential C++ walk (native.qlfc2_merge/rdemux) replays contexts
#     and pulls each element from its context's region.
#
# Runs ride as bytes with a 255-escape to a u32 side list (BWT runs-1
# are mostly 0; big runs are rare).
# ---------------------------------------------------------------------------

_QLFC2_NCTX = 2048


def _varints(vals) -> bytes:
    out = bytearray()
    for v in vals:
        v = int(v)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    return bytes(out)


def _unvarints(buf: bytes, off: int, count: int):
    vals = np.zeros(count, np.uint64)
    n = len(buf)
    for i in range(count):
        v, sh = 0, 0
        while True:
            if off >= n:
                raise ValueError("corrupt payload: truncated qlfc2 counts")
            b = buf[off]
            off += 1
            v |= (b & 0x7F) << sh
            if not (b & 0x80):
                break
            sh += 7
        vals[i] = v
    return vals, off


def _s8_lanes(m: int) -> int:
    """Deterministic lane count for the XLA-twin sub-stage (both sides
    derive it from m, which rides in the payload header)."""
    want = 1 << max(8, (m // 1024).bit_length())
    return min(8192, want)


def _substage(sub: int | None):
    """0 = flagship Pallas kernel, 1 = its XLA twin (rans_cdf_s8) for
    hosts without the TPU kernel path (CPU test rigs)."""
    if sub is None:
        import jax
        sub = 0 if jax.default_backend() not in ("cpu",) else 1
    return sub


# Sorted streams are padded to a coarse per-lane quantum so the flagship
# kernel's K (a static compile shape) lands on few distinct values across
# inputs/chunks - each new K costs a fresh kernel compile.  Padding is
# rank/run value 0, which the span-adaptive models code at ~0.03 bits.
_PAD_COLS = 128


def _padded_m(m: int, sub: int, g, ver: int = 2) -> int:
    lanes = (g.groups * 128) if sub == 0 else _s8_lanes(m)
    q = lanes * _PAD_COLS
    units = max(-(-m // q), 1)
    # ver >= 2: geometric grid - round the quantum count up to 3
    # significant bits (<= 4 distinct K per octave, <= 12.5% padding at
    # ~0.03 bits/symbol) so segmented 64MB inputs hit a handful of
    # kernel-compile variants instead of one per chunk.  ver 1 payloads
    # (round-4 early) used the raw quantum count; the header version
    # picks the derivation so both generations decode (ADVICE r04).
    if ver >= 2 and units > 4:
        sh = units.bit_length() - 3
        units = -(-units >> sh) << sh
    return units * q


def _sub_encode(sub: int, data: np.ndarray, g) -> bytes:
    if sub == 0:
        from turborc_tpu.codecs import rans_pallas
        return rans_pallas.encode_block(data, geom=g)
    return rans_cdf_s8.encode_block(data, lanes=_s8_lanes(data.shape[0]),
                                    step_quant=64, geom=g)


def _sub_decode(sub: int, payload: bytes, m: int, g) -> np.ndarray:
    if sub == 0:
        from turborc_tpu.codecs import rans_pallas
        return rans_pallas.decode_block(payload, m, geom=g)
    return rans_cdf_s8.decode_block(payload, m, lanes=_s8_lanes(m),
                                    step_quant=64, geom=g)


def encode_block2(data: np.ndarray, geom=None, sub: int | None = None,
                  **_unused) -> bytes:
    from turborc_tpu.ops.pallas.geom import DEFAULT
    g = geom or DEFAULT
    sub = _substage(sub)
    heads, runlens = run_split(data)
    m = heads.shape[0]
    ranks, init_list = native.qlfc2_ranks(heads)
    runs = (runlens - 1).astype(np.int64)
    rctx, rnctx = native.qlfc2_ctx(heads, ranks,
                                   np.minimum(runs, 31).astype(np.uint32))
    ro = np.argsort(rctx, kind="stable")
    rank_counts = np.bincount(rctx, minlength=_QLFC2_NCTX)
    no = np.argsort(rnctx, kind="stable")
    run_counts = np.bincount(rnctx, minlength=_QLFC2_NCTX)
    sruns = runs[no]
    esc = sruns >= 255
    run_bytes = np.where(esc, 255, sruns).astype(np.uint8)
    big = sruns[esc].astype("<u4")
    mp = _padded_m(m, sub, g)
    rank_pay = _sub_encode(sub, np.pad(ranks[ro], (0, mp - m)), g)
    run_pay = _sub_encode(sub, np.pad(run_bytes, (0, mp - m)), g)
    head = struct.pack("<QBB", m, 2, sub) + g.pack() + init_list.tobytes()
    head += _varints(rank_counts) + _varints(run_counts)
    head += struct.pack("<I", big.shape[0]) + big.tobytes()
    head += struct.pack("<I", len(rank_pay))
    return head + rank_pay + run_pay


def decode_block2(payload: bytes, n: int, **_unused) -> np.ndarray:
    from turborc_tpu.ops.pallas.geom import Geom
    if len(payload) < 10 + 4 + 256:
        raise ValueError("corrupt payload: truncated qlfc2 header")
    m, ver, sub = struct.unpack_from("<QBB", payload)
    if ver not in (1, 2) or sub > 1:
        raise ValueError("corrupt payload: bad qlfc2 version")
    try:
        g = Geom.unpack(payload[10:14])
    except ValueError as e:
        raise ValueError(f"corrupt payload: bad qlfc2 geometry ({e})")
    init_list = np.frombuffer(payload[14:270], np.uint8)
    rank_counts, off = _unvarints(payload, 270, _QLFC2_NCTX)
    run_counts, off = _unvarints(payload, off, _QLFC2_NCTX)
    if int(rank_counts.sum()) != m or int(run_counts.sum()) != m:
        raise ValueError("corrupt payload: qlfc2 counts do not sum")
    if off + 8 > len(payload):
        raise ValueError("corrupt payload: truncated qlfc2 body")
    (n_esc,) = struct.unpack_from("<I", payload, off)
    off += 4
    if off + 4 * n_esc + 4 > len(payload):
        raise ValueError("corrupt payload: truncated qlfc2 escapes")
    big = np.frombuffer(payload[off:off + 4 * n_esc], "<u4")
    off += 4 * n_esc
    (rank_len,) = struct.unpack_from("<I", payload, off)
    off += 4
    if off + rank_len > len(payload):
        raise ValueError("corrupt payload: qlfc2 rank payload bounds")
    mp = _padded_m(m, sub, g, ver=ver)
    sranks = _sub_decode(sub, payload[off:off + rank_len], mp, g)[:m]
    run_bytes = _sub_decode(sub, payload[off + rank_len:], mp, g)[:m]
    sruns = run_bytes.astype(np.int64)
    esc_idx = np.flatnonzero(sruns == 255)
    if esc_idx.shape[0] != big.shape[0]:
        raise ValueError("corrupt payload: qlfc2 escape count mismatch")
    sruns[esc_idx] = big
    heads = native.qlfc2_merge(sranks, rank_counts, init_list)
    runs = native.qlfc2_rdemux(heads, sruns.astype(np.uint32), run_counts)
    runlens = runs.astype(np.int64) + 1
    if runlens.sum() != n:
        raise ValueError("corrupt payload: qlfc2 run lengths do not sum")
    return np.repeat(heads, runlens)
