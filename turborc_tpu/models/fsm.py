"""FSM bit predictor ('sf', reference mbc_sf.h + FSM{0,1,9}.txt tables).

The reference ships pretuned 32k-state tables (text triples s1,s0,p per
line, loaded by fsm_init, rc_sf.c:40-50).  We don't copy those tables;
instead we GENERATE a counter-state-machine of the same shape: states are
bounded (n0, n1) observation-count pairs, the probability is a KT-style
estimate, and transitions age the opposite counter (bounded-history
dynamics, the same family the shipped tables encode).

Table layout matches the reference struct fsm_t {u16 p; u16 s[2]}
(include/turborc.h:352-354): per state, a 15-bit probability of bit=1 and
two next-state ids.
"""
from __future__ import annotations

import functools

import numpy as np

RC_BITS = 15
TOTAL = 1 << RC_BITS


_PQ = 1024       # probability quantization levels (10 bits)
_NMAX = 31       # observation-count cap
_RATE_CAP = 32   # final divisor = the simple counter's 1/32 rate


@functools.lru_cache(maxsize=4)
def build_table(pq_levels: int = _PQ, nmax: int = _NMAX,
                rate_cap: int = _RATE_CAP):
    """Generate (prob [S], next0 [S], next1 [S]) int32 arrays.

    Count-adaptive-rate probability machine (round-2 redesign; the
    round-1 KT machine with aggressive opposite-counter aging measured
    38.2% on the shared 16MB corpus vs 28.6% for the reference's tuned
    FSM1): states are (quantized probability pq, observation count n);
    the update moves p toward the observed bit with divisor min(n+2,
    rate_cap) - a running average early (KT-like fast ramp, optimal for
    fresh contexts) that anneals into the simple counter's fixed 1/32
    rate.  32768 states, the reference's table scale (FSM1.txt: 32,665).
    """
    S = (nmax + 1) * pq_levels
    shift = 15 - pq_levels.bit_length() + 1  # 15->10 bits: >>5
    prob = np.empty(S, np.int32)
    nxt0 = np.empty(S, np.int32)
    nxt1 = np.empty(S, np.int32)
    for n in range(nmax + 1):
        d = min(n + 2, rate_cap)
        for pq in range(pq_levels):
            sid = n * pq_levels + pq
            p15 = (pq << shift) + (1 << (shift - 1))
            prob[sid] = min(TOTAL - 1, max(1, p15))
            n2 = min(n + 1, nmax)
            p0 = p15 - -(-p15 // d)                 # toward 0, move >= 1
            p1 = p15 + -(-(TOTAL - p15) // d)       # toward 1, move >= 1
            pq0 = min(pq_levels - 1, max(0, p0 >> shift))
            pq1 = min(pq_levels - 1, max(0, p1 >> shift))
            nxt0[sid] = n2 * pq_levels + pq0
            nxt1[sid] = n2 * pq_levels + pq1
    return prob, nxt0, nxt1


def initial_state() -> int:
    return _PQ // 2  # (n=0, p=1/2)


def parse_reference_format(text: str):
    """Parse the reference FSM text format (lines of 's1,s0,p').

    Provided for users who have their own tuned tables in TurboRC's
    format; we do not ship any.
    """
    s1s, s0s, ps = [], [], []
    for line in text.strip().splitlines():
        parts = line.replace(",", " ").split()
        if len(parts) < 3:
            continue
        s1, s0, p = (int(x) for x in parts[:3])
        s1s.append(s1)
        s0s.append(s0)
        ps.append(p)
    return (np.asarray(ps, np.int32), np.asarray(s0s, np.int32),
            np.asarray(s1s, np.int32))


N_STATES = 32768


def load_reference_table(text: str):
    """Parse a TurboRC-format FSM table with the loader's EXACT
    semantics (fsminit_, mbc_sf.h:66-75): table zero-filled to 32768
    states, per parsed state s1/s0 clamped to [0, N_STATES-1] and p to
    [1, 2^RC_BITS - 1].  Returns (prob, next0, next1) int32 [N_STATES]
    in build_table's layout.  We ship no tables; this loads a user's
    own copy of the reference's FSM{0,1,9}.txt for byte parity with
    `-psf` streams (rc_sf.c:40-50 loads the same file by id).
    """
    ps, s0s, s1s = parse_reference_format(text)
    k = min(ps.shape[0], N_STATES)
    prob = np.zeros(N_STATES, np.int32)
    nxt0 = np.zeros(N_STATES, np.int32)
    nxt1 = np.zeros(N_STATES, np.int32)
    prob[:k] = np.clip(ps[:k], 1, TOTAL - 1)
    nxt0[:k] = np.clip(s0s[:k], 0, N_STATES - 1)
    nxt1[:k] = np.clip(s1s[:k], 0, N_STATES - 1)
    return prob, nxt0, nxt1


def reference_initial_state() -> int:
    """mbu_init(_m_, mbu_probinit()) with mbu_probinit() = 0
    (mbc_sf.h:44-46): every tree node starts in state 0."""
    return 0
