"""Pallas TPU kernels for the flagship adaptive-CDF rANS codec.

Hardware constraints probed on this chip: no vector gathers, no unaligned
minor-dim dynamic slices, no int16 vregs - but dynamic-offset DMA
(HBM->VMEM) and pltpu.roll work.  The kernels are built gather-free.

DECODE.  GROUPS x 128 VPU lanes (8192 on v5e at groups=64).  Each group
owns one stream in *consumption order*: words appear exactly in the order
the group's lanes renorm (step-major, lane-minor), so each nibble step
reads a contiguous word run.  Group stream layout [R rows, 128]: rows 0-1
are the per-lane initial states (hi16, lo16), data words follow row-major.
Per nibble step:

  1. CDF16 search + state transition: elementwise 16-wide int32 VPU math
     (the reference's AVX2 cdf16ansdec, cdf_.h:52-59, widened to 128 lanes)
  2. renorm mask -> per-lane rank via a log2(128) prefix sum (pltpu.roll)
  3. word fetch: the next `count` words of the group stream distribute to
     the needing lanes via a 7-stage barrel gather over a 2-tile register
     queue; dequeue/refill are per-group-constant barrel rotations fed by
     a VMEM window that slides by dynamic-offset DMA once per grid step

All arithmetic is int32 (freq*(state>>15) <= 32768*(2^16-1) < 2^31).

ENCODE: a forward model kernel (same CDF math), a backward coding kernel
with division as exact base-256 long division in f32 (the reference's
reciprocal-multiplication DIVTDIV32, turborc_.h:163-196, plays the same
role), and a placement kernel that compacts per-slot emissions into the
consumption-order streams via log-depth barrel compaction (see
_make_place_kernel).

GEOMETRY (round 3): every format-relevant knob rides in a frozen Geom
(ops/pallas/geom.py) passed as a static argument; the TRC_* env vars set
only the DEFAULT geometry.  Model sharing: geom.share adjacent lanes
share one adaptive model pair over a contiguous share*K-byte span (lane
j of a set decodes bytes t*share + j), each lane updates its own copy
immediately and copies re-join every geom.sync bytes as repair(start +
sum of per-copy diffs), a log2(share) butterfly.  Tiered sync: the
frequency-rank remap concentrates hi nibbles in the low lo-table rows by
construction, so only rows < geom.srows re-join every sync; rows >=
srows re-join every geom.lsync bytes; rows >= geom.arows are fully
static (no update, no sync, no write-back).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

RC_BITS = 15
TOTAL = 1 << RC_BITS
ANS_LOW = 1 << 15
CDFRATE = 7
IC = 10
MIXD = (TOTAL - 1) & ~31

# Default-geometry aliases (round-2 compat for importers; the kernels
# themselves take a Geom).  Tile geometry swept on v5e: the kernels are
# LATENCY-bound (serial dependency chains per nibble), so wider tiles
# are nearly free throughput.
GROUPS = DEFAULT.groups
GLANES = 128
LANES = DEFAULT.lanes
CHUNK = DEFAULT.chunk
WROWS = DEFAULT.wrows
SHARE = DEFAULT.share
SYNC = DEFAULT.sync
SROWS = DEFAULT.srows
LSYNC = DEFAULT.lsync
AROWS = DEFAULT.arows
PROWS = DEFAULT.prows

# Interpret mode (tests): runs every pallas_call op-by-op on CPU.  Only
# practical at tiny geometry (TRC_GROUPS=2), which is how CI covers the
# decode kernel's cross-grid-step carry off-hardware.
INTERPRET = bool(int(os.environ.get("TRC_INTERPRET", "0")))

# Timing-ablation knob (perf attribution ONLY - decode output is WRONG
# with any part disabled): comma-set of {sync, losync, wb, rowsel, fetch}
# to skip in the decode kernel.
ABLATE = frozenset(filter(None,
                          os.environ.get("TRC_ABLATE", "").split(",")))


def _treesum(parts):
    """Balanced-tree sum to keep dependency chains log-depth."""
    parts = list(parts)
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


# ---------------------------------------------------------------------------
# tile helpers (pure (8,128) int32 math)
# ---------------------------------------------------------------------------

def _prefix_sum_lanes(x):
    """Exclusive prefix sum along the 128-lane axis of an (8,128) tile."""
    total = x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for sh in (1, 2, 4, 8, 16, 32, 64):
        total = total + jnp.where(lane >= sh, pltpu.roll(total, sh, 1), 0)
    return total - x


def _lane_select2(row0, row1, inrow1, col):
    """out[s,l] = (inrow1 ? row1 : row0)[s, col[s,l]] - gather-free.

    Uses 128 native lane rotations: pltpu.roll(x, k, 1)[l] = x[(l-k) % 128],
    so row[col_l] appears at lane l in the copy rolled by d = (l-col) % 128.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, col.shape, 1)
    d = (lane - col) & 127
    parts = []
    for k in range(GLANES):
        hit = d == k
        src = jnp.where(inrow1, pltpu.roll(row1, k, 1),
                        pltpu.roll(row0, k, 1))
        parts.append(jnp.where(hit, src, 0))
    return _treesum(parts)


def _select16(vals, b0, b1, b2, b3):
    """vals[idx] per lane for idx with precomputed bit masks: 4-level
    binary-tree select, 15 wheres and no adds (vs one-hot treesum's
    16 wheres + 15 adds)."""
    v = [jnp.where(b0, vals[2 * i + 1], vals[2 * i]) for i in range(8)]
    v = [jnp.where(b1, v[2 * i + 1], v[2 * i]) for i in range(4)]
    v = [jnp.where(b2, v[2 * i + 1], v[2 * i]) for i in range(2)]
    return jnp.where(b3, v[1], v[0])


def _idx_bits(idx):
    return ((idx & 1) != 0, (idx & 2) != 0, (idx & 4) != 0, (idx & 8) != 0)


def _select_dyn(vals, idx):
    """vals[idx] per lane, any list length: binary-tree select padded to
    the next power of two (n-1 wheres, no adds)."""
    n = 1
    while n < len(vals):
        n <<= 1
    vals = list(vals) + [vals[0]] * (n - len(vals))
    bit = 1
    while len(vals) > 1:
        b = (idx & bit) != 0
        vals = [jnp.where(b, vals[2 * i + 1], vals[2 * i])
                for i in range(len(vals) // 2)]
        bit <<= 1
    return vals[0]


def _cdf_search(cdf, value):
    """cdf = list of 16 (G,128) tiles. Returns (sym, low, freq)."""
    sym = _treesum([(cdf[i] <= value).astype(jnp.int32)
                    for i in range(1, 16)])
    bits = _idx_bits(sym)
    low = _select16(cdf, *bits)
    nxt = _select16(cdf[1:] + [jnp.full_like(cdf[0], TOTAL)], *bits)
    return sym, low, nxt - low


def _repair16(new):
    """Strict monotone repair: log-depth prefix max of (cdf_i - i)."""
    d = [new[i] - i for i in range(16)]
    for s in (1, 2, 4, 8):
        d = [jnp.maximum(d[i], d[i - s]) if i >= s else d[i]
             for i in range(16)]
    return [d[i] + i for i in range(16)]


def _clamp16(cdf):
    """Upper strict-monotone clamp (cdf16.clamp_top): batched updates can
    overshoot TOTAL at the top of the table."""
    return [jnp.minimum(cdf[i], TOTAL - 16 + i) for i in range(16)]


def _cdf_delta(cdf, low, rate=CDFRATE):
    """Per-symbol shifted update delta (cdf16.delta), entry list form."""
    return [((i * IC - cdf[i]
              + jnp.where(cdf[i] > low, MIXD, 0)) >> rate)
            for i in range(16)]


def _cdf_update(cdf, low, rate=CDFRATE):
    """Single-symbol staircase-mix update.  No repair/clamp: for a valid
    strict-monotone cdf they are provably no-ops here - new gap >=
    g + floor((tgap - g)/128) >= 1 since every target gap >= IC = 10,
    and the top entry self-limits below 2^15 because the >>7 step stops
    advancing within 128 of its fixpoint (verified by brute force, 6M
    steps).  Only the SYNC re-join's summed diffs can violate, so repair
    + clamp run there."""
    d = _cdf_delta(cdf, low, rate)
    return [cdf[i] + d[i] for i in range(16)]


def _set_sum(x, lane, share):
    """Butterfly sum within aligned share-lane sets along the lane axis.

    XOR-partner exchange: stage k pairs lane with lane^k; roll(x, k)[l]
    = x[l-k] serves the (lane & k) half, roll(x, 128-k) the other.  Sets
    are aligned so partners never cross set boundaries."""
    for k in range(1, share):
        if k & (k - 1):
            continue
        px = jnp.where((lane & k) != 0, pltpu.roll(x, k, 1),
                       pltpu.roll(x, GLANES - k, 1))
        x = x + px
    return x


def _rejoin_rows(cdf_lo, start_lo, lane, rows, share):
    """Re-join the given lo-table rows across each share-lane set:
    repair(clamp(start + sum of per-copy diffs)), writing both buffers."""
    for h in rows:
        dsum = [_set_sum(cdf_lo[h, i] - start_lo[h, i], lane, share)
                for i in range(16)]
        new_r = _clamp16(_repair16(
            [start_lo[h, i] + dsum[i] for i in range(16)]))
        for i in range(16):
            cdf_lo[h, i] = new_r[i]
            start_lo[h, i] = new_r[i]


def _dec_search(state, cdf):
    """Symbol search + state transition, NO model update (the caller
    applies its own-copy update and the SYNC-window cross-lane re-join
    separately)."""
    value = state & (TOTAL - 1)
    sym, low, freq = _cdf_search(cdf, value)
    state = freq * (state >> RC_BITS) + value - low
    return state, sym, low


# ---- packed-pair lo-table representation (decode-kernel internal).
# CDF entries are < 2^15 (clamp16 keeps entry i <= TOTAL-16+i), so two
# u16 halves of an int32 hold a pair with a clear guard bit each: the
# 16-entry row rides in 8 registers.  The 16-row context select then
# costs 8x15 wheres instead of 16x15 - the single largest op block of
# the decode hot loop (~240/byte, ROUND4_NOTES section 3).  Packing is
# pure layout: unpacked entry math is unchanged, so payloads and the
# XLA twin stay bit-identical.

def _pack16(e):
    return [e[2 * j] | (e[2 * j + 1] << 16) for j in range(8)]


def _unpack16(p):
    out = []
    for j in range(8):
        out.append(p[j] & 0xFFFF)
        out.append(p[j] >> 16)  # top half < 2^15 -> sign bit clear
    return out


def _rejoin_rows_pk(cdf_pk, start_pk, lane, rows, share):
    """Packed-row twin of _rejoin_rows: unpack, re-join, repack."""
    for h in rows:
        cur = _unpack16([cdf_pk[h, j] for j in range(8)])
        st = _unpack16([start_pk[h, j] for j in range(8)])
        dsum = [_set_sum(cur[i] - st[i], lane, share) for i in range(16)]
        new_r = _clamp16(_repair16([st[i] + dsum[i] for i in range(16)]))
        new_p = _pack16(new_r)
        for j in range(8):
            cdf_pk[h, j] = new_p[j]
            start_pk[h, j] = new_p[j]


# Warm-start model init: every lane starts from its GROUP's nibble
# statistics (per-group cumulative tables ride in the payload and both
# sides rebuild identical initial state; the reference's static cdfini,
# rccdf.c:50-68, plays the same role for its static codecs).  The tables
# arrive pre-broadcast as VMEM inputs [16, G, 128] / [16, 16, G, 128].

def _init_tables(cdf_hi, cdf_lo, hi_tbl, lo_tbl, arows, start_lo=None):
    for i in range(16):
        cdf_hi[i] = hi_tbl[i]
        for h in range(arows):
            cdf_lo[h, i] = lo_tbl[h, i]
            if start_lo is not None:
                start_lo[h, i] = lo_tbl[h, i]


def _broadcast_tables(hi_tbl, lo_tbl, g: Geom):
    """[16, G] / [16, 16, G] int32 -> VMEM-shaped per-lane broadcasts."""
    hi = jnp.broadcast_to(hi_tbl[:, :, None], (16, g.groups, GLANES))
    lo = jnp.broadcast_to(lo_tbl[:, :, :, None],
                          (16, 16, g.groups, GLANES))
    return hi, lo


def _default_tables(g: Geom):
    stair = jnp.arange(16, dtype=jnp.int32) << (RC_BITS - 4)
    hi = jnp.broadcast_to(stair[:, None], (16, g.groups))
    lo = jnp.broadcast_to(stair[None, :, None], (16, 16, g.groups))
    return hi, lo


# ---------------------------------------------------------------------------
# barrel-shifter primitives (log-depth data movement)
#
# A per-lane variable shift out[l] = x[l - z_l] decomposes into 7
# conditional rolls (high bit to low) EXACTLY when z is lane-monotone
# with increments in {0, 1}: bit k of z_l set implies every lane in
# [l - 2^k, l] shares z's bits above k, so partial moves compose.  Rank
# sequences (prefix sums of 0/1 masks) have exactly this shape.  A
# per-group CONSTANT distance is the degenerate monotone case, which
# gives cyclic rotations by a traced per-group amount.
# ---------------------------------------------------------------------------

def _barrel_gather(x, z):
    """out[l] = x[l - z_l] for monotone z (increments 0/1), z in [0,127]."""
    for k in (64, 32, 16, 8, 4, 2, 1):
        x = jnp.where((z & k) != 0, pltpu.roll(x, k, 1), x)
    return x


def _rot_right(x, c):
    """Cyclic right rotation by per-group constant c [G,1] in [0,128)."""
    for k in (64, 32, 16, 8, 4, 2, 1):
        x = jnp.where((c & k) != 0, pltpu.roll(x, k, 1), x)
    return x


def _compact(w, need, lane):
    """Monotone stream compaction: needing lanes' words move down to
    dense front positions (their ranks), order preserved.  Low-bit-first
    valid-masked barrel stages are collision-free for monotone routes
    (the butterfly concentrator property: remaining distances of any two
    packets meeting at a lane differ mod 2^(k+1), so exactly one moves).
    """
    rank = _prefix_sum_lanes(need.astype(jnp.int32))
    dist = jnp.where(need, lane - rank, 0)
    val = w
    valid = need
    for k in (1, 2, 4, 8, 16, 32, 64):
        move = valid & ((dist & k) != 0)
        inc_val = pltpu.roll(val, 128 - k, 1)       # [l] <- [l+k]
        inc_move = pltpu.roll(move.astype(jnp.int32), 128 - k, 1) != 0
        inc_dist = pltpu.roll(dist, 128 - k, 1)
        stay = valid & ~move
        val = jnp.where(stay, val, jnp.where(inc_move, inc_val, val))
        dist = jnp.where(stay, dist, jnp.where(inc_move, inc_dist - k,
                                               dist))
        valid = stay | inc_move
    return val


def _shift_pair_left(q0, q1, c, lane):
    """(q0,q1) viewed as a 256-word row shifted left by per-group c
    in [0,128]: new q0 = pair[c : c+128], new q1 = pair[c+128 :] ++ junk."""
    cm = c & 127
    r0 = _rot_right(q0, (128 - cm) & 127)   # == left-rotate by cm
    r1 = _rot_right(q1, (128 - cm) & 127)
    take_hi = lane >= (128 - cm)
    n0 = jnp.where(take_hi, r1, r0)
    n1 = jnp.where(take_hi, r0, r1)  # junk beyond valid count (tracked)
    full = c >= 128
    n0 = jnp.where(full, q1, n0)
    n1 = jnp.where(full, q1, n1)     # c == 128: q1 becomes head, tail junk
    return n0, n1


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------

def _make_fetch(window, base_v, lane):
    """Build the per-step word-fetch closure over a kernel's stream
    window (shared by the o0 and o1 decode kernels)."""
    wrows = window.shape[1]

    def fetch(state, q0, q1, vcnt, consumed):
        need = state < ANS_LOW
        needi = need.astype(jnp.int32)
        rank = _prefix_sum_lanes(needi)
        word = _barrel_gather(q0, lane - rank)
        state = jnp.where(need, (state << 16) | word, state)
        cnt = jnp.sum(needi, axis=1, keepdims=True)
        q0, q1 = _shift_pair_left(q0, q1, cnt, lane)
        vcnt = vcnt - cnt
        consumed = consumed + cnt
        # refill one window row when at most 128 words remain (cnt <= 128
        # per fetch keeps vcnt >= 0; one row per fetch restores vcnt to
        # (128, 256] because cnt <= 128)
        refill = vcnt <= 128
        fillrel = (consumed + vcnt) >> 7
        fillrel = fillrel - base_v  # row to append, window-relative
        row = _select_dyn([window[:, w, :] for w in range(wrows)], fillrel)
        rs = _rot_right(row, vcnt & 127)
        q0 = jnp.where(refill & (lane >= vcnt), rs, q0)
        q1 = jnp.where(refill & (lane < vcnt), rs, q1)
        vcnt = jnp.where(refill, vcnt + 128, vcnt)
        return state, q0, q1, vcnt, consumed
    return fetch


def _make_decode_kernel(g: Geom):
    def _decode_kernel(hi_tbl, lo_tbl, stream_ref, out_ref, fstate_ref,
                       states, cdf_hi, cdf_lo, start_lo, queue, window,
                       pword, vq, wbase, sem):
        """Queue-based decode: the next 256 unconsumed words of each
        group live in two register tiles (queue); the per-fetch word
        distribution is a 7-stage barrel gather (monotone rank
        distances) instead of a 128-way roll-select, and dequeue/refill
        are per-group-constant rotations.  The VMEM window keeps feeding
        the queue one row at a time; it slides by DMA once per WSTEPS
        grid steps (the window covers WSTEPS steps of worst-case
        consumption; per-group DMA issue cost is the batching target)."""
        gi = pl.program_id(0)
        # interpret mode deadlocks on DMA waits under pl.when: slide
        # every step there (correct for any W - the window just covers
        # more than one step's consumption)
        ws = 1 if INTERPRET else g.wsteps

        @pl.when(gi == 0)
        def _():
            for s in range(g.groups):
                pword[s] = 0

        # ---- slide the stream windows (base = consumed row at slide)
        def _slide():
            for s in range(g.groups):
                wbase[s] = pword[s] >> 7
            copies = [pltpu.make_async_copy(
                stream_ref.at[s, pl.ds(wbase[s], g.wrows), :],
                window.at[s], sem.at[s]) for s in range(g.groups)]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        if ws == 1:
            _slide()
        else:
            pl.when(gi % ws == 0)(_slide)

        @pl.when(gi == 0)
        def _():
            states[:, :] = (window[:, 0, :] << 16) | window[:, 1, :]
            for i in range(16):
                cdf_hi[i] = hi_tbl[i]
            # adaptive lo rows seed from the PRE-PACKED warm-table input
            # (static rows >= arows keep reading the constant input
            # directly in the select - Mosaic hoists them)
            for h in range(g.arows):
                for j in range(8):
                    cdf_lo[h, j] = lo_tbl[h, j]
                    if g.share > 1:
                        start_lo[h, j] = lo_tbl[h, j]
            queue[0] = window[:, 2, :]
            queue[1] = window[:, 3, :]

        lane = jax.lax.broadcasted_iota(jnp.int32, (g.groups, GLANES), 1)
        base_v = jnp.stack([wbase[s]
                            for s in range(g.groups)])[:, None]  # (G,1)
        # absolute queue-head position (the 2 flush-state rows count as
        # consumed, so the head starts at word 256 with rows 2-3 queued);
        # pword persists the head, which also drives the window DMA base
        consumed = jnp.stack([pword[s] for s in range(g.groups)])[:, None]
        consumed = jnp.where(gi == 0, 256, consumed)
        vcnt = jnp.stack([vq[s] for s in range(g.groups)])[:, None]
        vcnt = jnp.where(gi == 0, 256, vcnt)  # valid queue words (128,256]
        q0, q1 = queue[0], queue[1]
        state = states[:, :]
        hi_t = [cdf_hi[i] for i in range(16)]

        fetch = _make_fetch(window, base_v, lane)

        start_hi = hi_t
        for t in range(g.chunk):
            # ---- hi nibble (own copy, immediate own update)
            state, hi, low_h = _dec_search(state, hi_t)
            state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt,
                                                  consumed)
            hi_t = _cdf_update(hi_t, low_h, g.rate)

            # ---- lo nibble: context-select the PACKED row (binary-tree
            # select on hi's bits: 15 wheres x 8 packed regs - half the
            # unpacked cost), unpack, decode, repack, write back
            hb = _idx_bits(hi)
            if "rowsel" in ABLATE:
                row_p = [cdf_lo[0, j] for j in range(8)]
            else:
                row_p = [_select16(
                    [cdf_lo[h, j] if h < g.arows else lo_tbl[h, j]
                     for h in range(16)], *hb)
                    for j in range(8)]
            row_t = _unpack16(row_p)
            state, lo, low_l = _dec_search(state, row_t)
            if "fetch" in ABLATE:
                state = jnp.where(state < ANS_LOW, state | (1 << 20), state)
            else:
                state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt,
                                                      consumed)
            new_p = _pack16(_cdf_update(row_t, low_l, g.rate))
            if "wb" not in ABLATE:
                for h in range(g.arows):
                    hit = hi == h
                    for j in range(8):
                        cdf_lo[h, j] = jnp.where(hit, new_p[j],
                                                 cdf_lo[h, j])

            out_ref[t] = (hi << 4) | lo

            # ---- cross-lane sync: copies re-join as repair(start + sum
            # of set diffs since the last sync).  start_lo always holds
            # the last sync state (the sync writes BOTH buffers; no
            # snapshot copies), hi snapshots live in registers.  The
            # repair+clamp at sync is load-bearing: leaving rows
            # unrepaired feeds the repair lift back into the next diff
            # sum, a xSHARE positive feedback that balloons the tables
            # (measured: ratio 27.4% -> 40.7%).  Tiered: only the hot lo
            # rows (< srows) re-join here; cold rows re-join once per
            # lsync bytes below.
            if g.share > 1 and t % g.sync == g.sync - 1 \
                    and "sync" not in ABLATE:
                d = [_set_sum(hi_t[i] - start_hi[i], lane, g.share)
                     for i in range(16)]
                hi_t = _clamp16(_repair16([start_hi[i] + d[i]
                                           for i in range(16)]))
                start_hi = hi_t
                if "losync" not in ABLATE:
                    _rejoin_rows_pk(cdf_lo, start_lo, lane,
                                    range(g.hrows), g.share)

        # ---- cold-row re-join at the LSYNC boundary (grid-step aligned;
        # rows >= arows are static and never re-join)
        if g.share > 1 and g.arows > g.srows and "sync" not in ABLATE \
                and "losync" not in ABLATE:
            @pl.when((gi + 1) % g.lsync_steps == 0)
            def _():
                _rejoin_rows_pk(cdf_lo, start_lo, lane,
                                range(g.srows, g.arows), g.share)

        # ---- persist carry state (pword = absolute consumed position)
        states[:, :] = state
        fstate_ref[:, :] = state  # last grid step's write = final states
        queue[0] = q0
        queue[1] = q1
        for i in range(16):
            cdf_hi[i] = hi_t[i]
        for s in range(g.groups):
            pword[s] = consumed[s, 0]
            vq[s] = vcnt[s, 0]

    return _decode_kernel


# ---------------------------------------------------------------------------
# split-state decode (geom.nstates == 2): two rANS states per lane, one
# decoding hi nibbles and one lo nibbles, each with its own consumption-
# order stream/queue/window.  The per-byte critical path drops from
# (search+fetch) x2 to one search+fetch per chain - the chains run in
# parallel, coupled only by the lo row select (needs the hi symbol) and
# the shared adaptive model (state-independent, so no extra serialization).
# Reference analog: the 4-way state interleave of anscdf_.h:97-103.
# ---------------------------------------------------------------------------

def _make_decode_kernel_x2(g: Geom):
    def _decode_kernel(hi_tbl, lo_tbl, stream_ref, out_ref, fstate_ref,
                       states, cdf_hi, cdf_lo, start_lo, queue, window,
                       pword, vq, wbase, sem):
        gi = pl.program_id(0)
        ws = 1 if INTERPRET else g.wsteps  # see o0 kernel note

        @pl.when(gi == 0)
        def _():
            for si in range(2):
                for s in range(g.groups):
                    pword[si, s] = 0

        # ---- slide both stream windows (base = consumed row at slide)
        def _slide():
            for si in range(2):
                for s in range(g.groups):
                    wbase[si, s] = pword[si, s] >> 7
            copies = [pltpu.make_async_copy(
                stream_ref.at[si, s, pl.ds(wbase[si, s], g.wrows), :],
                window.at[si, s], sem.at[si, s])
                for si in range(2) for s in range(g.groups)]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

        if ws == 1:
            _slide()
        else:
            pl.when(gi % ws == 0)(_slide)

        @pl.when(gi == 0)
        def _():
            for si in range(2):
                states[si] = ((window[si, :, 0, :] << 16)
                              | window[si, :, 1, :])
                queue[si, 0] = window[si, :, 2, :]
                queue[si, 1] = window[si, :, 3, :]
            _init_tables(cdf_hi, cdf_lo, hi_tbl, lo_tbl, g.arows,
                         start_lo if g.share > 1 else None)

        lane = jax.lax.broadcasted_iota(jnp.int32, (g.groups, GLANES), 1)
        base_v = [jnp.stack([wbase[si, s] for s in range(g.groups)])[:, None]
                  for si in range(2)]
        con = [jnp.stack([pword[si, s] for s in range(g.groups)])[:, None]
               for si in range(2)]
        con = [jnp.where(gi == 0, 256, c) for c in con]
        vc = [jnp.stack([vq[si, s] for s in range(g.groups)])[:, None]
              for si in range(2)]
        vc = [jnp.where(gi == 0, 256, v) for v in vc]
        q0h, q1h = queue[0, 0], queue[0, 1]
        q0l, q1l = queue[1, 0], queue[1, 1]
        st_h, st_l = states[0], states[1]
        vch, vcl = vc[0], vc[1]
        conh, conl = con[0], con[1]
        hi_t = [cdf_hi[i] for i in range(16)]

        fetch_h = _make_fetch(window.at[0], base_v[0], lane)
        fetch_l = _make_fetch(window.at[1], base_v[1], lane)

        start_hi = hi_t
        for t in range(g.chunk):
            # ---- hi nibble on its own state/stream
            st_h, hi, low_h = _dec_search(st_h, hi_t)
            st_h, q0h, q1h, vch, conh = fetch_h(st_h, q0h, q1h, vch, conh)
            hi_t = _cdf_update(hi_t, low_h, g.rate)

            # ---- lo nibble on the second state/stream
            hb = _idx_bits(hi)
            row_t = [_select16(
                [cdf_lo[h, i] if h < g.arows else lo_tbl[h, i]
                 for h in range(16)], *hb)
                for i in range(16)]
            st_l, lo, low_l = _dec_search(st_l, row_t)
            st_l, q0l, q1l, vcl, conl = fetch_l(st_l, q0l, q1l, vcl, conl)
            new_row = _cdf_update(row_t, low_l, g.rate)
            for h in range(g.arows):
                hit = hi == h
                for i in range(16):
                    cdf_lo[h, i] = jnp.where(hit, new_row[i],
                                             cdf_lo[h, i])

            out_ref[t] = (hi << 4) | lo

            if g.share > 1 and t % g.sync == g.sync - 1:
                d = [_set_sum(hi_t[i] - start_hi[i], lane, g.share)
                     for i in range(16)]
                hi_t = _clamp16(_repair16([start_hi[i] + d[i]
                                           for i in range(16)]))
                start_hi = hi_t
                _rejoin_rows(cdf_lo, start_lo, lane, range(g.hrows),
                             g.share)

        if g.share > 1 and g.arows > g.srows:
            @pl.when((gi + 1) % g.lsync_steps == 0)
            def _():
                _rejoin_rows(cdf_lo, start_lo, lane,
                             range(g.srows, g.arows), g.share)

        # ---- persist carry state per stream
        states[0] = st_h
        states[1] = st_l
        fstate_ref[0] = st_h
        fstate_ref[1] = st_l
        queue[0, 0] = q0h
        queue[0, 1] = q1h
        queue[1, 0] = q0l
        queue[1, 1] = q1l
        for i in range(16):
            cdf_hi[i] = hi_t[i]
        for s in range(g.groups):
            pword[0, s] = conh[s, 0]
            pword[1, s] = conl[s, 0]
            vq[0, s] = vch[s, 0]
            vq[1, s] = vcl[s, 0]

    return _decode_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def decode_tile_x2(gstreams: jnp.ndarray, K: int,
                   hi_tbl: jnp.ndarray | None = None,
                   lo_tbl: jnp.ndarray | None = None,
                   geom: Geom = DEFAULT):
    """gstreams [2, GROUPS, R, GLANES] int32 (hi-state streams first) ->
    (bytes [K, GROUPS, GLANES], final_states [2, GROUPS, GLANES])."""
    g = geom
    assert K % g.chunk == 0 and g.nstates == 2
    if hi_tbl is None:
        hi_tbl, lo_tbl = _default_tables(g)
    hi_b, lo_b = _broadcast_tables(hi_tbl, lo_tbl, g)
    grid = K // g.chunk
    return pl.pallas_call(
        _make_decode_kernel_x2(g),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, g.groups, GLANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((g.chunk, g.groups, GLANES),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, g.groups, GLANES), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, g.groups, GLANES), jnp.int32),
                   jax.ShapeDtypeStruct((2, g.groups, GLANES), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((2, g.groups, GLANES), jnp.int32),       # states
            pltpu.VMEM((16, g.groups, GLANES), jnp.int32),      # cdf_hi
            pltpu.VMEM((g.crows, 16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((g.crows, 16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((2, 2, g.groups, GLANES), jnp.int32),    # queues
            pltpu.VMEM((2, g.groups, g.wrows, GLANES), jnp.int32),
            pltpu.SMEM((2, g.groups), jnp.int32),               # pword
            pltpu.SMEM((2, g.groups), jnp.int32),               # vq
            pltpu.SMEM((2, g.groups), jnp.int32),               # wbase
            pltpu.SemaphoreType.DMA((2, g.groups)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(hi_b, lo_b, gstreams)


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def decode_tile(gstreams: jnp.ndarray, K: int,
                hi_tbl: jnp.ndarray | None = None,
                lo_tbl: jnp.ndarray | None = None,
                geom: Geom = DEFAULT) -> jnp.ndarray:
    """gstreams [GROUPS, R, GLANES] int32 (consumption-order + state rows,
    padded with >= geom.wrows extra rows) -> (bytes [K, GROUPS, GLANES],
    final_states [GROUPS, GLANES]) - the final states carry the 16-bit
    payload seeds (state seeding: final = ANS_LOW + seed).

    hi_tbl [16, GROUPS] / lo_tbl [16, 16, GROUPS] int32: per-group
    warm-start cumulative CDF tables (defaults: uniform staircase)."""
    g = geom
    assert K % g.chunk == 0
    if hi_tbl is None:
        hi_tbl, lo_tbl = _default_tables(g)
    hi_b, lo_b = _broadcast_tables(hi_tbl, lo_tbl, g)
    # pre-pack the lo rows (2 u16 entries / int32) for the packed select
    # (axes are [row, entry, G, GLANES] - _cum_args/_broadcast_tables)
    lo_b = lo_b[:, 0::2] | (lo_b[:, 1::2] << 16)     # [16, 8, G, GLANES]
    grid = K // g.chunk
    return pl.pallas_call(
        _make_decode_kernel(g),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((16, g.groups, GLANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((g.chunk, g.groups, GLANES),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((g.groups, GLANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((K, g.groups, GLANES), jnp.int32),
                   jax.ShapeDtypeStruct((g.groups, GLANES), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((g.groups, GLANES), jnp.int32),          # states
            pltpu.VMEM((16, g.groups, GLANES), jnp.int32),      # cdf_hi
            # lo rows packed 2 entries/int32 (all 16 rows; static rows
            # beyond arows written once at init)
            pltpu.VMEM((16, 8, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((16, 8, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((2, g.groups, GLANES), jnp.int32),       # queue
            pltpu.VMEM((g.groups, g.wrows, GLANES), jnp.int32),  # window
            pltpu.SMEM((g.groups,), jnp.int32),                 # pword
            pltpu.SMEM((g.groups,), jnp.int32),                 # vq
            pltpu.SMEM((g.groups,), jnp.int32),                 # wbase
            pltpu.SemaphoreType.DMA((g.groups,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(hi_b, lo_b, gstreams)


# ---------------------------------------------------------------------------
# encode kernels
# ---------------------------------------------------------------------------

def _cdf_lookup(cdf, sym):
    """(low, freq) for a known symbol (encode side)."""
    bits = _idx_bits(sym)
    low = _select16(cdf, *bits)
    nxt = _select16(cdf[1:] + [jnp.full_like(cdf[0], TOTAL)], *bits)
    return low, nxt - low


def _make_model_kernel(g: Geom):
    def _model_kernel(hi_tbl, lo_tbl, block_ref, probs_ref, cdf_hi,
                      cdf_lo, start_lo):
        """Forward model pass: per-nibble (low<<16 | freq) for the whole
        tile.  Mirrors the decode kernel's update order exactly
        (immediate own updates + end-of-grid-step cross-lane sync)."""
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            _init_tables(cdf_hi, cdf_lo, hi_tbl, lo_tbl, g.arows,
                         start_lo if g.share > 1 else None)

        lane = jax.lax.broadcasted_iota(jnp.int32, (g.groups, GLANES), 1)
        hi_t = [cdf_hi[i] for i in range(16)]
        start_hi = hi_t
        for t in range(g.chunk):
            b = block_ref[t]
            hi, lo = b >> 4, b & 15
            low_h, fr_h = _cdf_lookup(hi_t, hi)
            hi_t = _cdf_update(hi_t, low_h, g.rate)
            hb = _idx_bits(hi)
            row_t = [_select16(
                [cdf_lo[h, i] if h < g.arows else lo_tbl[h, i]
                 for h in range(16)], *hb)
                for i in range(16)]
            low_l, fr_l = _cdf_lookup(row_t, lo)
            new_row = _cdf_update(row_t, low_l, g.rate)
            for h in range(g.arows):
                hit = hi == h
                for i in range(16):
                    cdf_lo[h, i] = jnp.where(hit, new_row[i], cdf_lo[h, i])
            probs_ref[2 * t] = (low_h << 16) | fr_h
            probs_ref[2 * t + 1] = (low_l << 16) | fr_l
            if g.share > 1 and t % g.sync == g.sync - 1:
                d = [_set_sum(hi_t[i] - start_hi[i], lane, g.share)
                     for i in range(16)]
                hi_t = _clamp16(_repair16([start_hi[i] + d[i]
                                           for i in range(16)]))
                start_hi = hi_t
                _rejoin_rows(cdf_lo, start_lo, lane, range(g.hrows),
                             g.share)
        if g.share > 1 and g.arows > g.srows:
            @pl.when((gi + 1) % g.lsync_steps == 0)
            def _():
                _rejoin_rows(cdf_lo, start_lo, lane,
                             range(g.srows, g.arows), g.share)
        for i in range(16):
            cdf_hi[i] = hi_t[i]

    return _model_kernel


def _exact_div(state, freq):
    """q = state // freq for 0 <= state < freq << 16, 1 <= freq <= 2^15.

    The coder calls this after renorm, which guarantees state < freq<<16,
    i.e. q < 2^16: the two high base-256 digits of the long division are
    zero and the remainder after them is simply state >> 16.  Two f32
    digit steps remain (partial dividends < 2^23 are f32-exact); plays
    the role of the reference's reciprocal LUT (turborc_.h:163-196).
    """
    r = state >> 16
    q = jnp.zeros_like(state)
    ff = freq.astype(jnp.float32)
    for sh in (8, 0):
        cur = (r << 8) | ((state >> sh) & 0xFF)
        qd = jnp.floor(cur.astype(jnp.float32) / ff).astype(jnp.int32)
        rd = cur - qd * freq
        qd = qd + (rd >= freq).astype(jnp.int32) - (rd < 0).astype(jnp.int32)
        rd = cur - qd * freq
        q = (q << 8) | qd
        r = rd
    return q


def _make_coder_kernel(steps: int):
    def _coder_kernel(init_ref, probs_ref, words_ref, emit_ref, stout_ref,
                      states):
        """Backward coding pass over one reversed chunk of nibble slots.
        init_ref [G, 128]: per-lane initial encoder states (>= ANS_LOW;
        state seeding stores 16 bits of payload per lane in them)."""
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            states[:, :] = init_ref[:, :]

        state = states[:, :]
        for t in range(steps - 1, -1, -1):
            pr = probs_ref[t]
            low = pr >> 16
            freq = pr & 0xFFFF
            emit = state >= (freq << 16)
            words_ref[t] = state & 0xFFFF
            emit_ref[t] = emit.astype(jnp.int32)
            state = jnp.where(emit, jax.lax.shift_right_logical(state, 16),
                              state)
            q = _exact_div(state, freq)
            state = (q << RC_BITS) + (state - q * freq) + low
        states[:, :] = state
        stout_ref[:, :] = state  # last grid step's write = flush states

    return _coder_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile_pallas(block: jnp.ndarray, K: int,
                       hi_tbl: jnp.ndarray | None = None,
                       lo_tbl: jnp.ndarray | None = None,
                       init_states: jnp.ndarray | None = None,
                       geom: Geom = DEFAULT):
    """block [LANES, K] -> (gstreams, glens) via the Pallas passes."""
    g = geom
    assert K % g.chunk == 0
    block = block.astype(jnp.int32)  # callers may push compact uint8
    if hi_tbl is None:
        hi_tbl, lo_tbl = _default_tables(g)
    if init_states is None:
        shp = (g.groups, GLANES) if g.nstates == 1 else (2, g.groups,
                                                         GLANES)
        init_states = jnp.full(shp, ANS_LOW, jnp.int32)
    hi_b, lo_b = _broadcast_tables(hi_tbl, lo_tbl, g)
    cols = block.T.reshape(K, g.groups, GLANES)
    probs = pl.pallas_call(
        _make_model_kernel(g),
        grid=(K // g.chunk,),
        in_specs=[
            pl.BlockSpec((16, g.groups, GLANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ] +
        [pl.BlockSpec((g.chunk, g.groups, GLANES), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * g.chunk, g.groups, GLANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, g.groups, GLANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((g.crows, 16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((g.crows, 16, g.groups, GLANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(hi_b, lo_b, cols)

    if g.nstates == 2:
        # split-state: hi slots (even) coded by state 0, lo (odd) by
        # state 1, each into its own consumption-order stream set
        gs_h, gl_h = coder_and_place(probs[0::2], init_states[0], K,
                                     geom=geom, steps=g.chunk)
        gs_l, gl_l = coder_and_place(probs[1::2], init_states[1], K,
                                     geom=geom, steps=g.chunk)
        return jnp.stack([gs_h, gs_l]), jnp.stack([gl_h, gl_l])
    return coder_and_place(probs, init_states, K, geom=geom)


def coder_and_place(probs, init_states, K: int, geom: Geom = DEFAULT,
                    steps: int | None = None):
    """Backward coding pass + placement over an [S, G, 128] probs tensor
    (shared by the o0 and o1 encode pipelines).  S = steps * (K/chunk)
    slots; steps defaults to 2*chunk (both nibbles on one state), the
    split-state pipelines pass steps=chunk per stream."""
    g = geom
    n = K // g.chunk
    if steps is None:
        steps = 2 * g.chunk
    S = probs.shape[0]
    assert S == n * steps
    words, emit, state = pl.pallas_call(
        _make_coder_kernel(steps),
        grid=(n,),
        in_specs=[pl.BlockSpec((g.groups, GLANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((steps, g.groups, GLANES),
                               lambda i: (n - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((steps, g.groups, GLANES),
                                lambda i: (n - 1 - i, 0, 0),
                                memory_space=pltpu.VMEM)] * 2 + [
            pl.BlockSpec((g.groups, GLANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((S, g.groups, GLANES),
                                        jnp.int32)]
        * 2 + [jax.ShapeDtypeStruct((g.groups, GLANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((g.groups, GLANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(init_states, probs)
    return place_tile(words, emit, state, K, geom=geom, steps=steps)


# ---------------------------------------------------------------------------
# placement kernel: compact per-slot emissions into consumption-order
# group streams.  This is the encode-side mirror of the decode fetch: the
# words emitted at forward slot t by the needing lanes of a group occupy
# the next `count` consecutive stream positions in lane order.  A plain
# XLA scatter for this compaction is ~70x slower than the coding kernels
# (serialized scatter), so it runs as a kernel: per slot, words are
# roll-accumulated into a VMEM window at (p + rank) offsets, and the
# window is flushed to HBM once per grid step with overlapping rewrites
# (later steps rewrite the partial tail rows).
# ---------------------------------------------------------------------------


def _make_place_kernel(g: Geom, steps: int):
    # window rows sized from the actual slots per grid step: steps words
    # per lane worst-case + 4 phase rows (g.pwrows only equals this when
    # steps == g.rows_per_step; the o1/bittree pipelines pass the o0
    # default steps=2*chunk even under an x2 geometry - ADVICE r04)
    pwrows = steps + 4

    def _place_kernel(words_ref, emit_ref, out_ref, acc, pword, prow, sem):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            acc[:, :, :] = jnp.zeros((g.groups, pwrows, GLANES), jnp.int32)
            for s in range(g.groups):
                pword[s] = 256  # data starts after the 2 flush-state rows
                prow[s] = 0

        # in-window word offset per group (absolute pos - window base row)
        p = jnp.stack([pword[s] - prow[s] * 128
                       for s in range(g.groups)])[:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (g.groups, GLANES), 1)

        for t in range(steps):
            need = emit_ref[t] != 0
            w = jnp.where(need, words_ref[t], 0)
            needi = need.astype(jnp.int32)
            cnt = jnp.sum(needi, axis=1, keepdims=True)
            # compact the emitted words to dense front order, rotate them
            # to the window phase, and mask-split over the (at most) two
            # target rows r_lo and r_lo+1 - all log-depth
            dense = _compact(w, need, lane)
            p127 = p & 127
            rs = _rot_right(dense, p127)
            end = p127 + cnt
            c0 = jnp.where((lane >= p127) & (lane < end), rs, 0)
            c1 = jnp.where(lane < end - 128, rs, 0)
            r_lo = p >> 7                  # (GROUPS, 1) scalar row per group
            for rr in range(pwrows):
                sel0 = (r_lo == rr).astype(jnp.int32)
                sel1 = (r_lo + 1 == rr).astype(jnp.int32)
                acc[:, rr, :] = acc[:, rr, :] + sel0 * c0 + sel1 * c1
            p = p + cnt

        # flush the window to HBM at each group's base row (overlapping
        # rewrites: the partial tail is rewritten complete by later
        # steps).  After the flush only the partial head row survives
        # (remaining words = p % 128 < 128): one log-depth dynamic row
        # select, everything above it zeroed.
        copies = [pltpu.make_async_copy(
            acc.at[s], out_ref.at[s, pl.ds(prow[s], pwrows), :],
            sem.at[s]) for s in range(g.groups)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()
        shift = p >> 7                         # (GROUPS, 1)
        head = _select_dyn([acc[:, v, :] for v in range(pwrows)],
                           shift)
        acc[:, :, :] = jnp.zeros((g.groups, pwrows, GLANES), jnp.int32)
        acc[:, 0, :] = head
        for s in range(g.groups):
            prow[s] = prow[s] + shift[s, 0]
            pword[s] = prow[s] * 128 + (p[s, 0] - shift[s, 0] * 128)

    return _place_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom", "steps"))
def place_tile(words: jnp.ndarray, emit: jnp.ndarray, state: jnp.ndarray,
               K: int, geom: Geom = DEFAULT, steps: int | None = None):
    """words/emit [S, GROUPS, GLANES], state [GROUPS, GLANES] ->
    (gstreams [GROUPS, R, GLANES], glens [GROUPS])."""
    g = geom
    if steps is None:
        steps = 2 * g.chunk
    S = words.shape[0]
    R = S + 2 + g.wrows
    n = K // g.chunk
    assert S == n * steps
    out = pl.pallas_call(
        _make_place_kernel(g, steps),
        grid=(n,),
        in_specs=[pl.BlockSpec((steps, g.groups, GLANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((g.groups, R, GLANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g.groups, steps + 4, GLANES), jnp.int32),  # acc
            pltpu.SMEM((g.groups,), jnp.int32),                  # pword
            pltpu.SMEM((g.groups,), jnp.int32),                  # prow
            pltpu.SemaphoreType.DMA((g.groups,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(words, emit)
    out = out.at[:, 0, :].set((state >> 16).astype(jnp.int32))
    out = out.at[:, 1, :].set((state & 0xFFFF).astype(jnp.int32))
    glens = 256 + jnp.sum(emit, axis=(0, 2))
    return out, glens


# ---------------------------------------------------------------------------
# XLA-side group-stream construction (encode) and host packing
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile(block: jnp.ndarray, K: int,
                hi_tbl: jnp.ndarray | None = None,
                lo_tbl: jnp.ndarray | None = None,
                init_states: jnp.ndarray | None = None,
                geom: Geom = DEFAULT):
    """block [LANES, K] int32 bytes -> (gstreams [GROUPS, R, 128],
    glens [GROUPS]).  XLA twin of the Pallas passes (same share-SHARE
    model semantics, via codecs/rans_cdf_s8); only the stitch differs
    (consumption order per 128-lane group instead of per lane)."""
    from turborc_tpu.codecs import rans_cdf_s8 as S8
    from turborc_tpu.ops import rans

    g = geom
    block = block.astype(jnp.int32)  # callers may push compact uint8
    L = block.shape[0]
    assert L == g.lanes
    if hi_tbl is None:
        hi_tbl, lo_tbl = _default_tables(g)
    # per-lane tables from the per-group args (lane l is in group l//128)
    hi0 = jnp.repeat(hi_tbl.T, GLANES, axis=0)                 # [L, 16]
    lo0 = jnp.repeat(jnp.transpose(lo_tbl, (2, 0, 1)), GLANES, axis=0)
    chunks = block.T.reshape(K // g.lsync, g.lsync // g.sync, g.sync, L)

    def win(carry, b):
        cdf_hi, cdf_lo, start_lo = carry
        start_hi = cdf_hi
        outs = []
        for u in range(g.sync):
            cdf_hi, cdf_lo, low_h, fr_h, low_l, fr_l = S8._code_byte(
                cdf_hi, cdf_lo, b[u], g.arows, g.rate)
            outs.append(jnp.stack([jnp.stack([low_h, fr_h]),
                                   jnp.stack([low_l, fr_l])]))
        if g.share > 1:
            cdf_hi = S8._sync(cdf_hi, start_hi, g.share)
            cdf_lo, start_lo = S8._sync_lo_hot(cdf_lo, start_lo, g.share,
                                               g.srows)
        return (cdf_hi, cdf_lo, start_lo), jnp.stack(outs)

    def fwd(carry, bs):
        cdf_hi, cdf_lo = carry
        (cdf_hi, cdf_lo, start_lo), outs = jax.lax.scan(
            win, (cdf_hi, cdf_lo, cdf_lo), bs)
        if g.share > 1 and g.arows > g.srows:
            cdf_lo = S8._sync_lo_cold(cdf_lo, start_lo, g.share, g.srows)
        return (cdf_hi, cdf_lo), outs

    _, probs = jax.lax.scan(fwd, (hi0, lo0), chunks)
    probs = probs.reshape(2 * K, 2, L)
    if g.nstates == 2:
        outs = []
        for si in range(2):
            init = (None if init_states is None
                    else init_states[si].reshape(L))
            w, e, st = rans.encode_backward(probs[si::2, 0],
                                            probs[si::2, 1],
                                            init_state=init)
            outs.append(_group_stitch(
                w.astype(jnp.int32).reshape(K, g.groups, GLANES),
                e.reshape(K, g.groups, GLANES),
                st.reshape(g.groups, GLANES), g))
        return (jnp.stack([outs[0][0], outs[1][0]]),
                jnp.stack([outs[0][1], outs[1][1]]))
    init = None if init_states is None else init_states.reshape(L)
    words, emit, state = rans.encode_backward(probs[:, 0], probs[:, 1],
                                              init_state=init)
    S = 2 * K
    return _group_stitch(
        words.astype(jnp.int32).reshape(S, g.groups, GLANES),
        emit.reshape(S, g.groups, GLANES),
        state.reshape(g.groups, GLANES), g)


def _group_stitch(words_g: jnp.ndarray, emit_g: jnp.ndarray,
                  state: jnp.ndarray, g: Geom = DEFAULT):
    """[S,G,128] emissions + [G,128] flush states -> consumption-order
    group streams ([G, R, 128], lengths [G])."""
    S = words_g.shape[0]
    R = S + 2 + g.wrows  # worst-case data rows + state rows + window pad
    eint = emit_g.astype(jnp.int32)
    # consumption order = (step, lane) lexicographic per group
    flat = eint.transpose(1, 0, 2).reshape(g.groups, S * GLANES)
    pos = 256 + jnp.cumsum(flat, axis=1) - flat
    pos = pos.reshape(g.groups, S, GLANES).transpose(1, 0, 2)
    out = jnp.zeros((g.groups, R * GLANES), jnp.int32)
    gi = jnp.broadcast_to(
        jnp.arange(g.groups, dtype=jnp.int32)[None, :, None],
        (S, g.groups, GLANES))
    posc = jnp.where(emit_g, pos, R * GLANES)
    out = out.at[gi.ravel(), posc.ravel()].set(
        words_g.ravel(), mode="drop")
    out = out.reshape(g.groups, R, GLANES)
    out = out.at[:, 0, :].set((state >> 16).astype(jnp.int32))
    out = out.at[:, 1, :].set((state & 0xFFFF).astype(jnp.int32))
    glens = 256 + jnp.sum(eint, axis=(0, 2))
    return out, glens
