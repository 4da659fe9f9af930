"""Pallas TPU kernels for the order-1 adaptive-CDF rANS codec.

Reference capability: anscdf1 / mnenc8x2x (anscdf.c:607-645,
anscdf_.h:121-126), bench id 64 - both nibble CDFs keyed on the full
previous byte.  A 256-context per-lane model is ~134 MB of VMEM state at
8192 lanes, so the TPU design quantizes the context through the
frequency-rank remap that the flagship payload already carries: after
remap byte value == frequency rank.  Round-3 wiring (o1cost o1m32+ow,
17.11% vs round-2's 19.13% on realsrcbwt16; see rans_cdf_r1 docstring):

    ctx  = prev < 24 ? prev : 24 + min(bitlen(prev-23), 7)   (32 rows)
    locx = prev>>4 == hi ? 32 + (prev & 15)    # 16-row MATCH PLANE
         : hi == 0       ? min(prev, 15) : 16 + hi           (48 rows)

The match plane carries most of the order-1 lo information on BWT data
(measured H(lo|locx): 1.99 -> 1.15 bits vs 1.04 at the full context).
Model wiring chosen from measured ideal-bits sweeps (bench/o1cost.py)
on the real-text BWT corpus.

Unlike the share-span o0 kernels there is NO cross-lane model sharing:
each lane codes a contiguous span with its own chain (the order-1
context must be the lane's own previous byte), so the sync butterflies -
63% of o0 decode time at SYNC=4 - vanish entirely.  The adaptation ramp
is paid down by per-group CONDITIONAL warm tables instead (o1cost: on a
512KB slice conditional warm start cuts model cost 3.35 -> 2.14 bits/B).

Stream format, fetch machinery, backward coder, and placement are shared
with ops/pallas/rans_kernel.py (consumption-order group streams).  Only
geom.groups and geom.chunk matter here (share/sync/arows are o0 knobs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

RC_BITS = K_.RC_BITS
TOTAL = K_.TOTAL
ANS_LOW = K_.ANS_LOW
GROUPS = K_.GROUPS
GLANES = K_.GLANES
LANES = K_.LANES
CHUNK = K_.CHUNK
WROWS = K_.WROWS
INTERPRET = K_.INTERPRET

# Context wiring constants shared with the XLA twin (codecs/rans_cdf_r1)
from turborc_tpu.codecs.rans_cdf_r1 import LIN, LROWS, NCTX  # noqa: E402


def _ctx_of(prev):
    """hi context row: ranks < LIN exact, log2 buckets above (32 rows)."""
    v = jnp.maximum(prev - (LIN - 1), 1)
    bl = (1 + (v >= 2).astype(jnp.int32) + (v >= 4).astype(jnp.int32)
          + (v >= 8).astype(jnp.int32) + (v >= 16).astype(jnp.int32)
          + (v >= 32).astype(jnp.int32) + (v >= 64).astype(jnp.int32)
          + (v >= 128).astype(jnp.int32))
    return jnp.where(prev < LIN, prev, LIN + jnp.minimum(bl, 7))


def _select_row(table, bits, base=0):
    """entry list [16] of (G,128) tiles selected from table[base+idx]."""
    return [K_._select16([table[base + c, i] for c in range(16)], *bits)
            for i in range(16)]


def _select_row32(table, ctx):
    """entry list [16] selected from table[ctx] over 32 rows."""
    bits = K_._idx_bits(ctx)
    b4 = (ctx & 16) != 0
    lo16 = _select_row(table, bits, base=0)
    hi16 = _select_row(table, bits, base=16)
    return [jnp.where(b4, hi16[i], lo16[i]) for i in range(16)]


def _writeback(table, idx, new_row, base=0, rows=16):
    """table[base+r, i] = new_row[i] where idx == r."""
    for r in range(rows):
        hit = idx == r
        for i in range(16):
            table[base + r, i] = jnp.where(hit, new_row[i],
                                           table[base + r, i])


def _init_tables_o1(cdf_hi, cdf_lo, hi_tbl, lo_tbl):
    for c in range(NCTX):
        for i in range(16):
            cdf_hi[c, i] = hi_tbl[c, i]
    for r in range(LROWS):
        for i in range(16):
            cdf_lo[r, i] = lo_tbl[r, i]


def _locx_of(prev, hi):
    base = jnp.where(hi == 0, jnp.minimum(prev, 15), 16 + hi)
    return jnp.where((prev >> 4) == hi, 32 + (prev & 15), base)


def _code_lo_row(cdf_lo, prev, hb, hi):
    """Select the lo row for (prev, hi): the match plane (rows 32-47,
    keyed by prev's lo rank) when prev's hi nibble equals hi, else rows
    0-15 by min(prev,15) when hi==0, else rows 16-31 by hi."""
    pb = K_._idx_bits(jnp.minimum(prev, 15))
    mb = K_._idx_bits(prev & 15)
    row_a = _select_row(cdf_lo, pb, base=0)
    row_b = _select_row(cdf_lo, hb, base=16)
    row_c = _select_row(cdf_lo, mb, base=32)
    m = (prev >> 4) == hi
    hz = hi == 0
    return [jnp.where(m, row_c[i], jnp.where(hz, row_a[i], row_b[i]))
            for i in range(16)]


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------

def _make_decode_kernel(g: Geom):
    def _decode_kernel(hi_tbl, lo_tbl, stream_ref, out_ref, fstate_ref,
                       states, cdf_hi, cdf_lo, prevs, queue, window,
                       pword, vq, wbase, sem):
        gi = pl.program_id(0)
        ws = 1 if INTERPRET else g.wsteps  # see o0 kernel note

        @pl.when(gi == 0)
        def _():
            for s in range(g.groups):
                pword[s] = 0

        # slide once per WSTEPS grid steps (DMA-issue batching, see o0)
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
            _init_tables_o1(cdf_hi, cdf_lo, hi_tbl, lo_tbl)
            queue[0] = window[:, 2, :]
            queue[1] = window[:, 3, :]
            prevs[:, :] = jnp.zeros((g.groups, GLANES), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (g.groups, GLANES), 1)
        base_v = jnp.stack([wbase[s]
                            for s in range(g.groups)])[:, None]
        consumed = jnp.stack([pword[s] for s in range(g.groups)])[:, None]
        consumed = jnp.where(gi == 0, 256, consumed)
        vcnt = jnp.stack([vq[s] for s in range(g.groups)])[:, None]
        vcnt = jnp.where(gi == 0, 256, vcnt)
        q0, q1 = queue[0], queue[1]
        state = states[:, :]
        prev = prevs[:, :]

        fetch = K_._make_fetch(window, base_v, lane)

        for t in range(g.chunk):
            ctx = _ctx_of(prev)
            hi_row = _select_row32(cdf_hi, ctx)
            state, hi, low_h = K_._dec_search(state, hi_row)
            state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt,
                                                  consumed)
            _writeback(cdf_hi, ctx, K_._cdf_update(hi_row, low_h, g.rate),
                       rows=NCTX)

            hb = K_._idx_bits(hi)
            row_t = _code_lo_row(cdf_lo, prev, hb, hi)
            state, lo, low_l = K_._dec_search(state, row_t)
            state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt,
                                                  consumed)
            new_row = K_._cdf_update(row_t, low_l, g.rate)
            locx = _locx_of(prev, hi)
            _writeback(cdf_lo, locx, new_row, rows=LROWS)

            b = (hi << 4) | lo
            out_ref[t] = b
            prev = b

        states[:, :] = state
        fstate_ref[:, :] = state
        prevs[:, :] = prev
        queue[0] = q0
        queue[1] = q1
        for s in range(g.groups):
            pword[s] = consumed[s, 0]
            vq[s] = vcnt[s, 0]

    return _decode_kernel


def _broadcast_tables(hi_tbl, lo_tbl, g: Geom):
    """[NCTX,16,G] / [LROWS,16,G] int32 -> per-lane VMEM broadcasts."""
    hi = jnp.broadcast_to(hi_tbl[:, :, :, None],
                          (NCTX, 16, g.groups, GLANES))
    lo = jnp.broadcast_to(lo_tbl[:, :, :, None],
                          (LROWS, 16, g.groups, GLANES))
    return hi, lo


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def decode_tile(gstreams: jnp.ndarray, K: int, hi_tbl: jnp.ndarray,
                lo_tbl: jnp.ndarray, geom: Geom = DEFAULT):
    """gstreams [GROUPS, R, 128] int32 -> (bytes [K, GROUPS, 128],
    final_states [GROUPS, 128]).  hi_tbl [NCTX,16,G], lo_tbl [LROWS,16,G]
    int32 cumulative warm tables."""
    g = geom
    assert K % g.chunk == 0
    hi_b, lo_b = _broadcast_tables(hi_tbl, lo_tbl, g)
    grid = K // g.chunk
    return pl.pallas_call(
        _make_decode_kernel(g),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((NCTX, 16, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LROWS, 16, g.groups, GLANES),
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
            pltpu.VMEM((g.groups, GLANES), jnp.int32),            # states
            pltpu.VMEM((NCTX, 16, g.groups, GLANES), jnp.int32),  # cdf_hi
            pltpu.VMEM((LROWS, 16, g.groups, GLANES), jnp.int32),  # cdf_lo
            pltpu.VMEM((g.groups, GLANES), jnp.int32),            # prevs
            pltpu.VMEM((2, g.groups, GLANES), jnp.int32),         # queue
            pltpu.VMEM((g.groups, g.wrows, GLANES), jnp.int32),   # window
            pltpu.SMEM((g.groups,), jnp.int32),                   # pword
            pltpu.SMEM((g.groups,), jnp.int32),                   # vq
            pltpu.SMEM((g.groups,), jnp.int32),                   # wbase
            pltpu.SemaphoreType.DMA((g.groups,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(hi_b, lo_b, gstreams)


# ---------------------------------------------------------------------------
# encode kernels (forward model pass; coder + placement shared with o0)
# ---------------------------------------------------------------------------

def _make_model_kernel(g: Geom):
    def _model_kernel(hi_tbl, lo_tbl, block_ref, probs_ref, cdf_hi,
                      cdf_lo, prevs):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            _init_tables_o1(cdf_hi, cdf_lo, hi_tbl, lo_tbl)
            prevs[:, :] = jnp.zeros((g.groups, GLANES), jnp.int32)

        prev = prevs[:, :]
        for t in range(g.chunk):
            b = block_ref[t]
            hi, lo = b >> 4, b & 15
            ctx = _ctx_of(prev)
            hi_row = _select_row32(cdf_hi, ctx)
            low_h, fr_h = K_._cdf_lookup(hi_row, hi)
            _writeback(cdf_hi, ctx, K_._cdf_update(hi_row, low_h, g.rate),
                       rows=NCTX)

            hb = K_._idx_bits(hi)
            row_t = _code_lo_row(cdf_lo, prev, hb, hi)
            low_l, fr_l = K_._cdf_lookup(row_t, lo)
            locx = _locx_of(prev, hi)
            _writeback(cdf_lo, locx, K_._cdf_update(row_t, low_l, g.rate),
                       rows=LROWS)

            probs_ref[2 * t] = (low_h << 16) | fr_h
            probs_ref[2 * t + 1] = (low_l << 16) | fr_l
            prev = b
        prevs[:, :] = prev

    return _model_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile_pallas(block: jnp.ndarray, K: int, hi_tbl: jnp.ndarray,
                       lo_tbl: jnp.ndarray,
                       init_states: jnp.ndarray | None = None,
                       geom: Geom = DEFAULT):
    """block [LANES, K] -> (gstreams, glens) via the o1 Pallas passes."""
    g = geom
    assert K % g.chunk == 0
    block = block.astype(jnp.int32)
    if init_states is None:
        init_states = jnp.full((g.groups, GLANES), ANS_LOW, jnp.int32)
    hi_b, lo_b = _broadcast_tables(hi_tbl, lo_tbl, g)
    cols = block.T.reshape(K, g.groups, GLANES)
    probs = pl.pallas_call(
        _make_model_kernel(g),
        grid=(K // g.chunk,),
        in_specs=[
            pl.BlockSpec((NCTX, 16, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LROWS, 16, g.groups, GLANES),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.chunk, g.groups, GLANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * g.chunk, g.groups, GLANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, g.groups, GLANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((NCTX, 16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((LROWS, 16, g.groups, GLANES), jnp.int32),
            pltpu.VMEM((g.groups, GLANES), jnp.int32),  # prevs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(hi_b, lo_b, cols)
    return K_.coder_and_place(probs, init_states, K, geom=geom)


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile(block: jnp.ndarray, K: int, hi_tbl: jnp.ndarray,
                lo_tbl: jnp.ndarray,
                init_states: jnp.ndarray | None = None,
                geom: Geom = DEFAULT):
    """XLA twin of the o1 Pallas passes (same model semantics via
    codecs/rans_cdf_r1's scan; consumption-order group stitch)."""
    from turborc_tpu.codecs import rans_cdf_r1 as R1
    from turborc_tpu.ops import rans

    g = geom
    block = block.astype(jnp.int32)
    L = block.shape[0]
    assert L == g.lanes
    # per-lane tables from per-group args (lane l is in group l//128)
    hi0 = jnp.repeat(jnp.transpose(hi_tbl, (2, 0, 1)), GLANES, axis=0)
    lo0 = jnp.repeat(jnp.transpose(lo_tbl, (2, 0, 1)), GLANES, axis=0)
    probs = R1.model_pass(block, K, hi0, lo0, rate=g.rate)
    init = None if init_states is None else init_states.reshape(L)
    words, emit, state = rans.encode_backward(probs[:, 0], probs[:, 1],
                                              init_state=init)
    S = 2 * K
    return K_._group_stitch(
        words.astype(jnp.int32).reshape(S, g.groups, GLANES),
        emit.reshape(S, g.groups, GLANES),
        state.reshape(g.groups, GLANES), g)
