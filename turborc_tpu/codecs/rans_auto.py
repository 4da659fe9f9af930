"""Auto-dispatching flagship (id 61): pick the operating point per block.

Round-2 measured a clean split between the two flagship designs on
identical hardware and bytes:

  * share-span o0 (rans-cdf-s8 / rans-cdf-o0-p): best on short-run data
    (synthetic textbwt, avg run 1.55 - ties the reference ans there) but
    its strided spans lose burst adaptation on long-run data (1.25x ref
    on realsrcbwt, avg run 5.0).
  * contiguous order-1 (rans-cdf-r1[-p]): best on run-structured real
    data (18.99% vs ref o0's 20.96% on realsrcbwt16) but pays its o1
    table adaptation for nothing on near-order-0 short-run data (the
    reference's own o1 loses to its o0 there: 27.81 vs 27.32).

The dispatch statistic is a HELD-OUT cross-entropy gain with the exact
context r1 uses (rank-quantized previous byte): per 64KB sample window,
train p(cur | min(prev_rank,15)) and p(cur) on the first half and
evaluate both on the second half.  Split-half evaluation is what makes
the statistic honest - raw plug-in conditional entropy at these window
sizes is wildly biased (an iid window shows a fake 2+ bit/B "gain"),
and block-local adaptation already captures global nonstationarity that
whole-corpus bigram stats would miscount as order-1 structure (the
synthetic textbwt corpus shows 0.97 bit/B globally yet the reference's
own o1 loses to its o0 there).  Gain >= 0.2 bits/B -> order-1 arm.

Round 3 adds a third arm: share-1 span geometry (tag 2).  On long-run
data that stays order-0-shaped (o1 gain below threshold but mean run
length high), the share-8 striding destroys burst adaptation (measured
1.253x vs reference on realsrcbwt while share-1 is 1.067x); the encoder
picks it from the mean-run statistic and the tag + v3 geometry header
make the block self-describing.

The chosen arm rides in a 1-byte payload tag so containers stay
self-describing; the Pallas kernel variants are used on TPU backends,
the XLA twins elsewhere (same payload tag semantics per backend family
as ids 57/58 and 59/60).
"""
from __future__ import annotations

import dataclasses

import numpy as np

GAIN_THRESHOLD = 0.2   # bits/byte of held-out order-1 gain
RUN_THRESHOLD = 2.5    # mean run length above which striding hurts
_WIN = 64 << 10
_MAX_WINDOWS = 8

# Tag 3 (round 4): order-1 arm with its own geometry embedded after the
# tag (Geom.pack, 4 bytes).  The o1 tables adapt per lane-span, so FEWER
# lanes = longer spans = better adaptation: g16 (2048 lanes) measured
# 15.95% vs 16.66% at the container-default g64 on realsrcbwt16
# (bench_artifacts/r03/o1_real16*.json).  Auto mode now picks the
# o1-optimal geometry itself instead of requiring a hand-set --geom.
_TAG_S8, _TAG_R1, _TAG_S1, _TAG_R1G = 0, 1, 2, 3

# o1-optimal geometry by block size: the g16 span win needs enough
# bytes per lane to amortize the warm-up (16MB/2048 lanes = 8KB spans);
# small blocks keep more lanes.
_R1_SPECS = ((4 << 20, "g4c8s8y4l32a16r4"),
             (1 << 20, "g8c8s8y4l32a16r4"))


def _impls():
    import jax
    if jax.default_backend() != "cpu":
        from turborc_tpu.codecs import rans_pallas, rans_pallas_r1
        return rans_pallas, rans_pallas_r1
    from turborc_tpu.codecs import rans_cdf_r1, rans_cdf_s8
    return rans_cdf_s8, rans_cdf_r1


def _window_gain(d: np.ndarray) -> float:
    """Held-out bits/byte saved by conditioning on min(prev_rank, 15)."""
    counts = np.bincount(d, minlength=256)
    rank = np.zeros(256, np.int64)
    rank[np.argsort(-counts, kind="stable")] = np.arange(256)
    r = rank[d]
    half = d.shape[0] // 2
    ctx = np.minimum(r[:-1], 15)
    cur = r[1:]
    tr_c, tr_x = cur[:half], ctx[:half]
    te_c, te_x = cur[half:], ctx[half:]
    o1 = np.zeros((16, 256), np.float64)
    np.add.at(o1, (tr_x, tr_c), 1)
    o0 = o1.sum(axis=0)
    p1 = (o1 + 0.5) / (o1.sum(axis=1, keepdims=True) + 128)
    p0 = (o0 + 0.5) / (o0.sum() + 128)
    ce1 = float(-np.log2(p1[te_x, te_c]).mean())
    ce0 = float(-np.log2(p0[te_c]).mean())
    return ce0 - ce1


def o1_gain(data: np.ndarray) -> float:
    """Mean held-out order-1 gain over up to 8 64KB sample windows."""
    n = data.shape[0]
    if n < 4096:
        return 0.0  # tiny blocks: table overhead decides, stay order-0
    wins = max(1, min(_MAX_WINDOWS, n // _WIN))
    gains = []
    for w in range(wins):
        off = (n - min(_WIN, n)) * w // max(wins - 1, 1)
        gains.append(_window_gain(data[off:off + _WIN]))
    return float(np.mean(gains))


def mean_run(data: np.ndarray) -> float:
    """Mean run length (sampled: first/last 1MB for large blocks)."""
    n = data.shape[0]
    if n < 2:
        return 1.0
    if n > (2 << 20):
        d = np.concatenate([data[:1 << 20], data[-(1 << 20):]])
    else:
        d = data
    changes = int((d[1:] != d[:-1]).sum()) + 1
    return d.shape[0] / changes


def _share1(geom):
    from turborc_tpu.ops.pallas.geom import DEFAULT
    return dataclasses.replace(geom or DEFAULT, share=1)


def _r1_geom(n: int, geom):
    """The o1-optimal geometry for an n-byte block, or None to keep the
    caller's geometry.  Any geometry the caller actually passed wins
    over the auto pick - including one equal to the env DEFAULT, which a
    caller can only reach by asking for it explicitly (ADVICE r04)."""
    from turborc_tpu.ops.pallas.geom import Geom
    if geom is not None:
        return None
    for floor, spec in _R1_SPECS:
        if n >= floor:
            return Geom.parse(spec)
    return None


def encode_block(data: np.ndarray, **kw) -> bytes:
    s8, r1 = _impls()
    geom = kw.get("geom")
    if o1_gain(data) >= GAIN_THRESHOLD:
        g1 = _r1_geom(data.shape[0], geom)
        if g1 is not None:
            # geom drives the kernel codec, lanes its XLA twin
            return (bytes([_TAG_R1G]) + g1.pack() + r1.encode_block(
                data, **dict(kw, geom=g1, lanes=g1.lanes)))
        tag, mod = _TAG_R1, r1
    elif (geom is None or geom.share > 1) and mean_run(data) >= RUN_THRESHOLD:
        tag, mod = _TAG_S1, s8
        kw = dict(kw, geom=_share1(geom))
    else:
        tag, mod = _TAG_S8, s8
    return bytes([tag]) + mod.encode_block(data, **kw)


def decode_block(payload: bytes, n: int, **kw) -> np.ndarray:
    if not payload:
        raise ValueError("corrupt payload: missing auto-dispatch tag")
    tag = payload[0]
    if tag not in (_TAG_S8, _TAG_R1, _TAG_S1, _TAG_R1G):
        raise ValueError(f"corrupt payload: bad auto-dispatch tag {tag}")
    s8, r1 = _impls()
    if tag == _TAG_R1G:
        from turborc_tpu.ops.pallas.geom import Geom
        if len(payload) < 5:
            raise ValueError("corrupt payload: truncated auto geometry")
        try:
            g = Geom.unpack(payload[1:5])
        except ValueError as e:
            raise ValueError(f"corrupt payload: bad auto geometry ({e})")
        return r1.decode_block(payload[5:], n,
                               **dict(kw, geom=g, lanes=g.lanes))
    if tag == _TAG_S1:
        kw = dict(kw, geom=_share1(kw.get("geom")))
    mod = r1 if tag == _TAG_R1 else s8
    return mod.decode_block(payload[1:], n, **kw)
