"""Adaptive-CDF rANS with span-shared models (share-k, order 0).

Round-2 ratio design.  Round-1 measured the whole ratio gap vs the
reference (28.46% vs ans 27.32% on identical 64 MB data) to be the
per-lane model adaptation ramp: 8192 lanes x 8 KB each pay 8192 warm-up
ramps, while the reference's sequential coder (anscdf.c:567-605) pays
one.  Fix (bench/modelcost.py measurements):

  * SHARE adjacent lanes share one adaptive model pair over a contiguous
    SHARE*K-byte span, positions strided: lane j of the set decodes
    bytes t*SHARE + j.  Each lane updates its own table copy immediately
    with its own symbols; every SYNC steps the copies re-synchronize by
    summing each copy's diff since the last sync (a log2(SHARE)
    butterfly in the TPU kernel).  Cross-lane information lags by at
    most SYNC bytes - measured lag cost ~0 up to share-64 - while the
    adaptation ramp divides by SHARE.
  * warm-start tables are per SEGMENT of the block (64 segments) instead
    of global, shrinking the distance each model must travel.

rANS state/stream layout is untouched - one state per lane, per-lane
streams, same stitch (ops/rans.py).  Only the model wiring differs from
rans_cdf_o0.  The Pallas flagship (codecs/rans_pallas.py) implements the
identical semantics in-kernel; this module is its XLA twin and the
reference-class standalone codec (registry id 58).

Geometry (round 3): share/sync/lsync/arows are RUNTIME (static-arg)
parameters threaded through the jitted passes and the block API; the
TRC_* env vars set only the defaults.  Containers record the geometry in
their v3 header, so payloads written at any knob setting decode in a
fresh default process.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from turborc_tpu.codecs import blockio
from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans

# Default geometry from the env knobs (shared with the Pallas kernels;
# see ops/pallas/geom.py).  All four are format-relevant.
SHARE = int(os.environ.get("TRC_SHARE", "8"))
SYNC = int(os.environ.get("TRC_SYNC", "4"))
SROWS = 4
LSYNC = int(os.environ.get("TRC_LSYNC", "32"))
AROWS = int(os.environ.get("TRC_AROWS", "16"))
N_SEG = 64     # warm-start table segments per block

assert LSYNC % SYNC == 0
assert 0 <= AROWS <= 16


def _lo_row(cdf_lo, sel):
    return jnp.sum(cdf_lo * sel[:, :, None], axis=1)


def _lo_put(cdf_lo, sel, row_old, row_new):
    return cdf_lo + (row_new - row_old)[:, None, :] * sel[:, :, None]


def _sync(cdf, start, share):
    """Re-synchronize share table copies: start + sum of per-copy diffs.

    cdf/start [L, ...] with lanes grouped as [M, share]; summing diffs
    within each set applies every member's updates to every copy.  The
    result is repaired+clamped (a valid CDF) - the kernels do the same.
    """
    L = cdf.shape[0]
    M = L // share
    tail = cdf.shape[1:]
    d = (cdf - start).reshape(M, share, *tail).sum(axis=1, keepdims=True)
    new = start.reshape(M, share, *tail) + d
    # repair+clamp here is load-bearing: leaving rows unrepaired feeds
    # the repair lift back into the next diff sum, a xSHARE positive
    # feedback that balloons the tables
    new = cdf16.clamp_top(cdf16._repair(new))
    return jnp.broadcast_to(new, (M, share) + tail).reshape(L, *tail)


def _hot_mask(srows):
    """[1, 16, 1] bool: lo rows < srows (re-join at the fast cadence)."""
    return (jnp.arange(16) < srows)[None, :, None]


def _sync_lo_hot(cdf_lo, start_lo, share, srows):
    """Tiered hot-row re-join: rows < srows from the full-table join
    (identical per-row math; cold rows keep their copies)."""
    joined = _sync(cdf_lo, start_lo, share)
    hot = _hot_mask(srows)
    return (jnp.where(hot, joined, cdf_lo),
            jnp.where(hot, joined, start_lo))


def _sync_lo_cold(cdf_lo, start_lo, share, srows):
    """Cold-row re-join at the LSYNC boundary (rows >= srows; start_lo's
    cold rows still hold the superchunk-start tables)."""
    joined = _sync(cdf_lo, start_lo, share)
    return jnp.where(_hot_mask(srows), cdf_lo, joined)


def _code_byte(cdf_hi, cdf_lo, b, arows, rate=cdf16.CDFRATE):
    """One per-lane o0 nibble-pair step (immediate own update).
    Returns (cdf_hi, cdf_lo, low_h, fr_h, low_l, fr_l)."""
    hi, lo = b >> 4, b & 15
    low_h, fr_h = cdf16.lookup(cdf_hi, hi)
    cdf_hi = cdf16.update_rate(cdf_hi, low_h, rate)
    sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
    row = _lo_row(cdf_lo, sel)
    low_l, fr_l = cdf16.lookup(row, lo)
    new_row = cdf16.update_rate(row, low_l, rate)
    if arows < 16:  # static cold rows: no update when hi >= arows
        new_row = jnp.where((hi < arows)[:, None], new_row, row)
    cdf_lo = _lo_put(cdf_lo, sel, row, new_row)
    return cdf_hi, cdf_lo, low_h, fr_h, low_l, fr_l


def _model_init(L, hi_tbl, lo_tbl, share):
    """Per-lane model tables from per-segment warm starts (lane l is in
    span l // share; span s -> segment s * n_seg // (L // share))."""
    n_seg = hi_tbl.shape[0]
    M = L // share
    seg = jnp.repeat((jnp.arange(M, dtype=jnp.int32) * n_seg) // M, share)
    return hi_tbl[seg], lo_tbl[seg]


@functools.partial(jax.jit, static_argnames=("K", "share", "sync",
                                             "lsync", "arows", "srows",
                                             "rate"))
def encode_device(block: jnp.ndarray, K: int, hi_tbl, lo_tbl,
                  share: int = SHARE, sync: int = SYNC,
                  lsync: int = LSYNC, arows: int = AROWS,
                  srows: int = SROWS, rate: int = cdf16.CDFRATE):
    """block [M, K, share] int32 bytes -> (streams [L, 2K+2], lengths)."""
    M = block.shape[0]
    L = M * share
    assert K % lsync == 0
    # [K, M, share] -> [K, L] byte columns (lane l = m*share + j)
    cols = jnp.transpose(block, (1, 0, 2)).reshape(K, L)
    # nested scan keeps the traced body one SYNC window (the flat
    # LSYNC-unrolled body was ~8x larger; serializing its executable
    # crashed the persistent cache)
    chunks = cols.reshape(K // lsync, lsync // sync, sync, L)

    def win(carry, b):
        cdf_hi, cdf_lo, start_lo = carry
        start_hi = cdf_hi
        outs = []
        for u in range(sync):
            cdf_hi, cdf_lo, low_h, fr_h, low_l, fr_l = _code_byte(
                cdf_hi, cdf_lo, b[u], arows, rate)
            outs.append(jnp.stack([jnp.stack([low_h, fr_h]),
                                   jnp.stack([low_l, fr_l])]))
        if share > 1:
            cdf_hi = _sync(cdf_hi, start_hi, share)
            cdf_lo, start_lo = _sync_lo_hot(cdf_lo, start_lo, share, srows)
        return (cdf_hi, cdf_lo, start_lo), jnp.stack(outs)

    def fwd(carry, bs):
        cdf_hi, cdf_lo = carry
        (cdf_hi, cdf_lo, start_lo), outs = jax.lax.scan(
            win, (cdf_hi, cdf_lo, cdf_lo), bs)
        if share > 1 and arows > srows:  # cold re-join per LSYNC bytes
            cdf_lo = _sync_lo_cold(cdf_lo, start_lo, share, srows)
        return (cdf_hi, cdf_lo), outs

    _, probs = jax.lax.scan(fwd, _model_init(L, hi_tbl, lo_tbl, share),
                            chunks)
    # [K//SYNC, SYNC, 2(sym), 2(low/freq), L] -> [2K, 2, L]
    probs = probs.reshape(2 * K, 2, L)
    words, emit, state = rans.encode_backward(probs[:, 0], probs[:, 1])
    return rans.stitch(words, emit, state)


@functools.partial(jax.jit, static_argnames=("K", "share", "sync",
                                             "lsync", "arows", "srows",
                                             "rate"))
def decode_device(streams: jnp.ndarray, K: int, hi_tbl, lo_tbl,
                  share: int = SHARE, sync: int = SYNC,
                  lsync: int = LSYNC, arows: int = AROWS,
                  srows: int = SROWS, rate: int = cdf16.CDFRATE):
    """streams [L, 2K+2] -> block [M, K, share] int32 bytes."""
    L = streams.shape[0]
    M = L // share
    assert K % lsync == 0
    state, pos = rans.dec_init(streams)

    def win(carry, _):
        cdf_hi, cdf_lo, start_lo, state, pos = carry
        start_hi = cdf_hi
        outs = []
        for _u in range(sync):
            value = (state & rans.MASK15).astype(jnp.int32)
            hi, low_h, fr_h = cdf16.search(cdf_hi, value)
            state = rans.dec_update(state, low_h, fr_h)
            cdf_hi = cdf16.update_rate(cdf_hi, low_h, rate)
            state, pos = rans.dec_renorm(state, streams, pos)

            sel = jax.nn.one_hot(hi, 16, dtype=cdf_lo.dtype)
            row = _lo_row(cdf_lo, sel)
            value = (state & rans.MASK15).astype(jnp.int32)
            lo, low_l, fr_l = cdf16.search(row, value)
            state = rans.dec_update(state, low_l, fr_l)
            new_row = cdf16.update_rate(row, low_l, rate)
            if arows < 16:  # static cold rows (mirror _code_byte)
                new_row = jnp.where((hi < arows)[:, None], new_row, row)
            cdf_lo = _lo_put(cdf_lo, sel, row, new_row)
            state, pos = rans.dec_renorm(state, streams, pos)
            outs.append((hi << 4) | lo)
        if share > 1:
            cdf_hi = _sync(cdf_hi, start_hi, share)
            cdf_lo, start_lo = _sync_lo_hot(cdf_lo, start_lo, share, srows)
        return (cdf_hi, cdf_lo, start_lo, state, pos), jnp.stack(outs)

    def dec(carry, _):
        cdf_hi, cdf_lo, state, pos = carry
        (cdf_hi, cdf_lo, start_lo, state, pos), outs = jax.lax.scan(
            win, (cdf_hi, cdf_lo, cdf_lo, state, pos), None,
            length=lsync // sync)
        if share > 1 and arows > srows:
            cdf_lo = _sync_lo_cold(cdf_lo, start_lo, share, srows)
        return (cdf_hi, cdf_lo, state, pos), outs

    cdf_hi, cdf_lo = _model_init(L, hi_tbl, lo_tbl, share)
    _, bytes_t = jax.lax.scan(dec, (cdf_hi, cdf_lo, state, pos), None,
                              length=K // lsync)
    # [K//SYNC, SYNC, L] -> [K, L] -> [M, K, share]
    return jnp.transpose(bytes_t.reshape(K, M, share), (1, 0, 2))


# ----------------------------------------------------------------------------
# Host block API
# ----------------------------------------------------------------------------

def segment_tables(data: np.ndarray, n_seg: int):
    """Per-segment warm-start nibble tables: ([n_seg,16], [n_seg,16,16])."""
    n = data.shape[0]
    his, los = [], []
    for g in range(n_seg):
        seg = data[g * n // n_seg:(g + 1) * n // n_seg]
        if seg.size == 0:
            seg = data
        hi_f, lo_f = blockio.nibble_tables(seg)
        his.append(hi_f)
        los.append(lo_f)
    return np.stack(his), np.stack(los)


def shape_spans(data: np.ndarray, lanes: int, step_quant: int,
                share: int = SHARE, lsync: int = LSYNC):
    """Pad + reshape flat bytes into [M, K, share] strided spans."""
    M = lanes // share
    n = data.shape[0]
    K = blockio.K_for(-(-n // share), M, max(step_quant, lsync))
    padded = np.zeros(M * K * share, np.uint8)
    padded[:n] = data
    return padded.reshape(M, K, share), K  # uint8: compact device push


def _n_seg(lanes: int, share: int) -> int:
    return min(N_SEG, lanes // share)


def encode_block(data: np.ndarray, lanes: int = 8192,
                 step_quant: int = 256, share: int | None = None,
                 sync: int | None = None, lsync: int | None = None,
                 arows: int | None = None, geom=None, **_unused) -> bytes:
    if geom is not None:
        share, sync, lsync, arows = (geom.share, geom.sync, geom.lsync,
                                     geom.arows)
        rate = geom.rate
    else:
        rate = cdf16.CDFRATE
    share = SHARE if share is None else share
    sync = SYNC if sync is None else sync
    lsync = LSYNC if lsync is None else lsync
    arows = AROWS if arows is None else arows
    n_seg = _n_seg(lanes, share)
    hi_f, lo_f = segment_tables(data, n_seg)
    block, K = shape_spans(data, lanes, step_quant, share, lsync)
    streams, lengths = encode_device(
        blockio.push_u8(block), K,
        jnp.asarray(blockio.cumulative(hi_f)),
        jnp.asarray(blockio.cumulative(lo_f)),
        share=share, sync=sync, lsync=lsync, arows=arows, rate=rate)
    return (hi_f.astype("<u2").tobytes() + lo_f.astype("<u2").tobytes()
            + blockio.pack_device(streams, lengths))


def decode_block(payload: bytes, n: int, lanes: int = 8192,
                 step_quant: int = 256, share: int | None = None,
                 sync: int | None = None, lsync: int | None = None,
                 arows: int | None = None, geom=None, **_unused) -> np.ndarray:
    if geom is not None:
        share, sync, lsync, arows = (geom.share, geom.sync, geom.lsync,
                                     geom.arows)
        rate = geom.rate
    else:
        rate = cdf16.CDFRATE
    share = SHARE if share is None else share
    sync = SYNC if sync is None else sync
    lsync = LSYNC if lsync is None else lsync
    arows = AROWS if arows is None else arows
    n_seg = _n_seg(lanes, share)
    tbl = 2 * n_seg * (16 + 256)
    if len(payload) < tbl:
        raise ValueError("corrupt payload: truncated warm-start tables")
    hi_f = np.frombuffer(payload[:n_seg * 32], "<u2").astype(
        np.int64).reshape(n_seg, 16)
    lo_f = np.frombuffer(payload[n_seg * 32:tbl], "<u2").astype(
        np.int64).reshape(n_seg, 16, 16)
    if (hi_f.sum(-1) != blockio.TOTAL).any() or \
            (lo_f.sum(-1) != blockio.TOTAL).any():
        raise ValueError("corrupt payload: bad warm-start tables")
    M = lanes // share
    K = blockio.K_for(-(-n // share), M, max(step_quant, lsync))
    streams = blockio.unpack_device(payload[tbl:], lanes, 2 * K + 2)
    block = blockio.fetch_u8(decode_device(
        streams, K,
        jnp.asarray(blockio.cumulative(hi_f)),
        jnp.asarray(blockio.cumulative(lo_f)),
        share=share, sync=sync, lsync=lsync, arows=arows, rate=rate))
    return block.reshape(-1)[:n]
