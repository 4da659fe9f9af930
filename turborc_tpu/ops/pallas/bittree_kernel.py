"""Pallas TPU kernels for the bitwise-tree codec family (`rc`, ref id 1).

The reference's `rc` coder (rc_.c:37-65, model mb_o0.h:89-112) codes a
byte as 8 binary decisions down a 256-node tree with one adaptive
probability per node (simple counter, mbc_s.h:53-55).  The round-1 XLA
port keeps exactly that structure but pays per-bit gather/scatter over
[L, 256] tables - measured 0.2-2 MB/s on TPU (BENCH_TABLE_B_r02), the
family's tracked weakness.

TPU-first redesign: NIBBLE-GROUPED coding of the SAME bit-tree model.
Within one byte the 8 path nodes are all distinct (one per tree level),
so the 8 predictions depend only on the pre-byte table state - the model
is unchanged whether bits are coded one at a time or four at a time.
The four binary intervals of a nibble compose EXACTLY by integer
interval subdivision of [0, 2^15):

    split(lo, w, p) = clip((w * p) >> 15, m, w - m)      # m = 8>>level
    bit=1 owns [lo, lo+split), bit=0 owns [lo+split, lo+w)

(the clip keeps every leaf >= 1 wide; widths stay subdividable by
induction).  The resulting (low, width) pair is ONE rANS symbol, so a
byte costs 2 coding steps + 2 stream fetches instead of 8 - the fetch
machinery is the dominant per-byte cost (see rans_kernel ablations).
Versus sequential binary coding this rounds each conditional
probability to the local interval width; measured cost on test corpora
is < 0.7% of output size (tests/test_bittree_kernel.py).

All data movement is gather-free: path-node reads are binary-tree
selects on the known path bits (11 wheres for the hi nibble, 236 for
the lo subtree), write-backs are per-row masked updates, and the stream
side reuses the flagship's queue/window/barrel machinery and its
consumption-order group-stream format (rans_kernel.py docstring).

Predictor: the reference's simple counter at 15-bit precision,
    p' = p - (((p - (bit << 15)) >> RATE) + bit),   RATE = 5
applied to the clamped prediction exactly like codecs/rc_bit.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import DEFAULT, Geom

RC_BITS = 15
TOTAL = 1 << RC_BITS
ANS_LOW = 1 << 15
RATE = 5

GROUPS = K_.GROUPS
GLANES = K_.GLANES
LANES = K_.LANES
CHUNK = K_.CHUNK
WROWS = K_.WROWS
INTERPRET = K_.INTERPRET


def _clamp_p(p):
    return jnp.clip(p, 1, TOTAL - 1)


def _upd(p, bit):
    """Simple-counter update on the clamped prediction (mbc_s.h:53-55)."""
    bi = bit.astype(jnp.int32)
    return p - (((p - (bi << RC_BITS)) >> RATE) + bi)


def _split(w, p, lvl):
    """bit=1 interval width within a w-wide interval; every leaf of the
    remaining (4-lvl)-level subtree keeps >= 1 unit of width."""
    m = 8 >> lvl
    return jnp.clip((w * p) >> RC_BITS, m, w - m)


def _sel(vals, idx):
    """vals[idx] per lane (binary-tree select, len(vals) - 1 wheres)."""
    return K_._select_dyn(vals, idx)


# ---------------------------------------------------------------------------
# model math shared by the decode kernel / encode model kernel.  The tree
# lives as 256 statically-indexed rows (node n = row n, rows 1..255 used).
# ---------------------------------------------------------------------------

def _hi_descend_known(tree, b):
    """Encode side: hi-nibble (low, width) + path updates for known byte.
    Returns (low, w, hi)."""
    b7, b6, b5, b4 = (b >> 7) & 1, (b >> 6) & 1, (b >> 5) & 1, (b >> 4) & 1
    lo_ = jnp.zeros_like(b)
    w = jnp.full_like(b, TOTAL)
    path = jnp.zeros_like(b)
    ps, bits = [], [b7, b6, b5, b4]
    for lvl in range(4):
        base = 1 << lvl
        p = _clamp_p(tree[base] if lvl == 0 else
                     _sel([tree[base + i] for i in range(base)], path))
        s = _split(w, p, lvl)
        bit = bits[lvl]
        lo_ = jnp.where(bit != 0, lo_, lo_ + s)
        w = jnp.where(bit != 0, s, w - s)
        ps.append(p)
        path = (path << 1) | bit
    # write back the 4 path nodes (path now == hi); the node visited at
    # level lvl sits at row base + (path's top lvl bits)
    for lvl in range(4):
        base = 1 << lvl
        newp = _upd(ps[lvl], (path >> (3 - lvl)) & 1)
        off = (path >> (4 - lvl)) if lvl else jnp.zeros_like(path)
        for i in range(base):
            tree[base + i] = jnp.where(off == i, newp, tree[base + i])
    return lo_, w, path


def _lo_descend_known(tree, hi, b):
    """Encode side: lo-nibble (low, width) + subtree path updates."""
    b3, b2, b1, b0 = (b >> 3) & 1, (b >> 2) & 1, (b >> 1) & 1, b & 1
    lo_ = jnp.zeros_like(b)
    w = jnp.full_like(b, TOTAL)
    path = hi                              # node = (16 << lvl) ... + path
    ps = []
    bits = [b3, b2, b1, b0]
    for lvl in range(4):
        base = 16 << lvl
        p = _clamp_p(_sel([tree[base + i] for i in range(base)], path))
        s = _split(w, p, lvl)
        bit = bits[lvl]
        lo_ = jnp.where(bit != 0, lo_, lo_ + s)
        w = jnp.where(bit != 0, s, w - s)
        ps.append(p)
        path = (path << 1) | bit
    lo4 = path & 15
    for lvl in range(4):
        base = 16 << lvl
        off = (hi << lvl) | (lo4 >> (4 - lvl) if lvl else 0)
        newp = _upd(ps[lvl], (lo4 >> (3 - lvl)) & 1)
        for i in range(base):
            tree[base + i] = jnp.where(off == i, newp, tree[base + i])
    return lo_, w, lo4


def _hi_descend_value(tree, value):
    """Decode side: walk hi levels against the coder value.
    Returns (low, w, hi)."""
    lo_ = jnp.zeros_like(value)
    w = jnp.full_like(value, TOTAL)
    path = jnp.zeros_like(value)
    ps, bits = [], []
    for lvl in range(4):
        base = 1 << lvl
        p = _clamp_p(tree[base] if lvl == 0 else
                     _sel([tree[base + i] for i in range(base)], path))
        s = _split(w, p, lvl)
        bit = (value - lo_ < s).astype(jnp.int32)
        lo_ = jnp.where(bit != 0, lo_, lo_ + s)
        w = jnp.where(bit != 0, s, w - s)
        ps.append(p)
        bits.append(bit)
        path = (path << 1) | bit
    for lvl in range(4):
        base = 1 << lvl
        off = (path >> (4 - lvl)) if lvl else jnp.zeros_like(path)
        newp = _upd(ps[lvl], bits[lvl])
        for i in range(base):
            tree[base + i] = jnp.where(off == i, newp, tree[base + i])
    return lo_, w, path


def _lo_descend_value(tree, hi, value):
    lo_ = jnp.zeros_like(value)
    w = jnp.full_like(value, TOTAL)
    path = hi
    ps, bits = [], []
    for lvl in range(4):
        base = 16 << lvl
        p = _clamp_p(_sel([tree[base + i] for i in range(base)], path))
        s = _split(w, p, lvl)
        bit = (value - lo_ < s).astype(jnp.int32)
        lo_ = jnp.where(bit != 0, lo_, lo_ + s)
        w = jnp.where(bit != 0, s, w - s)
        ps.append(p)
        bits.append(bit)
        path = (path << 1) | bit
    lo4 = path & 15
    for lvl in range(4):
        base = 16 << lvl
        off = (hi << lvl) | (lo4 >> (4 - lvl) if lvl else 0)
        newp = _upd(ps[lvl], bits[lvl])
        for i in range(base):
            tree[base + i] = jnp.where(off == i, newp, tree[base + i])
    return lo_, w, lo4


# ---------------------------------------------------------------------------
# decode kernel (stream machinery identical to rans_kernel._decode_kernel)
# ---------------------------------------------------------------------------

def _make_tree_decode_kernel(geom: Geom):
    GROUPS, CHUNK, WROWS = geom.groups, geom.chunk, geom.wrows

    def _tree_decode_kernel(tree_tbl, stream_ref, out_ref, fstate_ref,
                            states, tree_v, queue, window, pword, vq, sem):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            for s in range(GROUPS):
                pword[s] = 0

        base_row = [pword[s] >> 7 for s in range(GROUPS)]
        copies = [pltpu.make_async_copy(
            stream_ref.at[s, pl.ds(base_row[s], WROWS), :],
            window.at[s], sem.at[s]) for s in range(GROUPS)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        @pl.when(g == 0)
        def _():
            states[:, :] = (window[:, 0, :] << 16) | window[:, 1, :]
            for i in range(256):
                tree_v[i] = tree_tbl[i]
            queue[0] = window[:, 2, :]
            queue[1] = window[:, 3, :]

        lane = jax.lax.broadcasted_iota(jnp.int32, (GROUPS, GLANES), 1)
        base_v = jnp.stack(base_row)[:, None]
        consumed = jnp.stack([pword[s] for s in range(GROUPS)])[:, None]
        consumed = jnp.where(g == 0, 256, consumed)
        vcnt = jnp.stack([vq[s] for s in range(GROUPS)])[:, None]
        vcnt = jnp.where(g == 0, 256, vcnt)
        q0, q1 = queue[0], queue[1]
        state = states[:, :]
        tree = [tree_v[i] for i in range(256)]

        def fetch(state, q0, q1, vcnt, consumed):
            need = state < ANS_LOW
            needi = need.astype(jnp.int32)
            rank = K_._prefix_sum_lanes(needi)
            word = K_._barrel_gather(q0, lane - rank)
            state = jnp.where(need, (state << 16) | word, state)
            cnt = jnp.sum(needi, axis=1, keepdims=True)
            q0, q1 = K_._shift_pair_left(q0, q1, cnt, lane)
            vcnt = vcnt - cnt
            consumed = consumed + cnt
            refill = vcnt <= 128
            fillrel = (consumed + vcnt) >> 7
            fillrel = fillrel - base_v
            row = K_._select_dyn([window[:, w, :] for w in range(WROWS)],
                                 fillrel)
            rs = K_._rot_right(row, vcnt & 127)
            q0 = jnp.where(refill & (lane >= vcnt), rs, q0)
            q1 = jnp.where(refill & (lane < vcnt), rs, q1)
            vcnt = jnp.where(refill, vcnt + 128, vcnt)
            return state, q0, q1, vcnt, consumed

        for t in range(CHUNK):
            value = state & (TOTAL - 1)
            low, w, hi = _hi_descend_value(tree, value)
            state = w * (state >> RC_BITS) + value - low
            state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt, consumed)

            value = state & (TOTAL - 1)
            low, w, lo4 = _lo_descend_value(tree, hi, value)
            state = w * (state >> RC_BITS) + value - low
            state, q0, q1, vcnt, consumed = fetch(state, q0, q1, vcnt, consumed)

            out_ref[t] = (hi << 4) | lo4

        states[:, :] = state
        fstate_ref[:, :] = state
        queue[0] = q0
        queue[1] = q1
        for i in range(256):
            tree_v[i] = tree[i]
        for s in range(GROUPS):
            pword[s] = consumed[s, 0]
            vq[s] = vcnt[s, 0]

    return _tree_decode_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def decode_tile(gstreams: jnp.ndarray, K: int, tree_tbl: jnp.ndarray,
                geom: Geom = DEFAULT):
    """gstreams [GROUPS, R, 128] -> (bytes [K, GROUPS, 128], final states).

    tree_tbl [256] int32: warm-start node probabilities (row 0 unused)."""
    g = geom
    assert K % g.chunk == 0
    tree_b = jnp.broadcast_to(tree_tbl[:, None, None],
                              (256, g.groups, GLANES))
    return pl.pallas_call(
        _make_tree_decode_kernel(g),
        grid=(K // g.chunk,),
        in_specs=[
            pl.BlockSpec((256, g.groups, GLANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((256, g.groups, GLANES), jnp.int32),     # tree
            pltpu.VMEM((2, g.groups, GLANES), jnp.int32),       # queue
            pltpu.VMEM((g.groups, g.wrows, GLANES), jnp.int32),  # window
            pltpu.SMEM((g.groups,), jnp.int32),                 # pword
            pltpu.SMEM((g.groups,), jnp.int32),                 # vq
            pltpu.SemaphoreType.DMA((g.groups,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tree_b, gstreams)


# ---------------------------------------------------------------------------
# encode: forward model kernel -> coder kernel -> placement (both reused)
# ---------------------------------------------------------------------------

def _make_tree_model_kernel(geom: Geom):
    def _tree_model_kernel(tree_tbl, block_ref, probs_ref, tree_v):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            for i in range(256):
                tree_v[i] = tree_tbl[i]

        tree = [tree_v[i] for i in range(256)]
        for t in range(geom.chunk):
            b = block_ref[t]
            low, w, hi = _hi_descend_known(tree, b)
            probs_ref[2 * t] = (low << 16) | w
            low, w, _lo4 = _lo_descend_known(tree, hi, b)
            probs_ref[2 * t + 1] = (low << 16) | w
        for i in range(256):
            tree_v[i] = tree[i]

    return _tree_model_kernel


@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile_pallas(block: jnp.ndarray, K: int, tree_tbl: jnp.ndarray,
                       init_states: jnp.ndarray | None = None,
                       geom: Geom = DEFAULT):
    """block [LANES, K] -> (gstreams, glens) via the Pallas passes."""
    g = geom
    assert K % g.chunk == 0
    block = block.astype(jnp.int32)
    if init_states is None:
        init_states = jnp.full((g.groups, GLANES), ANS_LOW, jnp.int32)
    tree_b = jnp.broadcast_to(tree_tbl[:, None, None],
                              (256, g.groups, GLANES))
    cols = block.T.reshape(K, g.groups, GLANES)
    probs = pl.pallas_call(
        _make_tree_model_kernel(g),
        grid=(K // g.chunk,),
        in_specs=[
            pl.BlockSpec((256, g.groups, GLANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.chunk, g.groups, GLANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * g.chunk, g.groups, GLANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, g.groups, GLANES),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, g.groups, GLANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tree_b, cols)

    return K_.coder_and_place(probs, init_states, K, geom=geom)


# ---------------------------------------------------------------------------
# XLA encode twin (test parity + kernel-less platforms).  Identical
# arithmetic over [L, 256] gathered tables; produces the same group
# streams via rans.encode_backward + the flagship's stitch.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "geom"))
def encode_tile(block: jnp.ndarray, K: int, tree_tbl: jnp.ndarray,
                init_states: jnp.ndarray | None = None,
                geom: Geom = DEFAULT):
    from turborc_tpu.ops import rans

    block = block.astype(jnp.int32)
    L = block.shape[0]
    assert L == geom.lanes
    tree0 = jnp.broadcast_to(tree_tbl[None, :], (L, 256))
    lanes_idx = jnp.arange(L, dtype=jnp.int32)

    def code_nibble(tree, root16, bits):
        """root16: subtree base node (1 for hi, 16+hi for lo)."""
        lo_ = jnp.zeros((L,), jnp.int32)
        w = jnp.full((L,), TOTAL, jnp.int32)
        node = root16
        upd_idx, upd_val = [], []
        for lvl in range(4):
            p = _clamp_p(tree[lanes_idx, node])
            s = _split(w, p, lvl)
            bit = bits[lvl]
            lo_ = jnp.where(bit != 0, lo_, lo_ + s)
            w = jnp.where(bit != 0, s, w - s)
            upd_idx.append(node)
            upd_val.append(_upd(p, bit))
            node = (node << 1) | bit
        for i, v in zip(upd_idx, upd_val):
            tree = tree.at[lanes_idx, i].set(v)
        return tree, lo_, w

    def fwd(tree, b):
        hb = [(b >> i) & 1 for i in (7, 6, 5, 4)]
        lb = [(b >> i) & 1 for i in (3, 2, 1, 0)]
        hi = (hb[0] << 3) | (hb[1] << 2) | (hb[2] << 1) | hb[3]
        tree, lo_h, w_h = code_nibble(tree, jnp.ones_like(b), hb)
        tree, lo_l, w_l = code_nibble(tree, 16 + hi, lb)
        return tree, jnp.stack([jnp.stack([lo_h, w_h]),
                                jnp.stack([lo_l, w_l])])

    _, probs = jax.lax.scan(fwd, tree0, block.T)
    probs = probs.reshape(2 * K, 2, L)
    init = None if init_states is None else init_states.reshape(L)
    words, emit, state = rans.encode_backward(probs[:, 0], probs[:, 1],
                                              init_state=init)
    S = 2 * K
    return K_._group_stitch(
        words.astype(jnp.int32).reshape(S, geom.groups, GLANES),
        emit.reshape(S, geom.groups, GLANES),
        state.reshape(geom.groups, GLANES), geom)


# ---------------------------------------------------------------------------
# warm-start table from the block byte histogram
# ---------------------------------------------------------------------------

def warm_tree(data: np.ndarray) -> np.ndarray:
    """[256] int32 node probabilities p15(bit=1 | node) from byte counts
    (row 0 unused).  The coded-bit convention: bit=1 child of node n is
    2n+1 (rc_bit: node = (node << 1) | bit)."""
    counts = np.zeros(512, np.int64)
    if data.size:
        counts[256:] = np.bincount(data, minlength=256)
    for n in range(255, 0, -1):
        counts[n] = counts[2 * n] + counts[2 * n + 1]
    tot = np.maximum(counts[1:256], 1)
    p = (counts[2 * np.arange(1, 256) + 1] * TOTAL + tot // 2) // tot
    out = np.zeros(256, np.int32)
    out[1:] = np.clip(p, 1, TOTAL - 1)
    return out
