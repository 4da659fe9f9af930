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


@functools.lru_cache(maxsize=4)
def build_table(max_count: int = 40, age_num: int = 6, age_den: int = 7):
    """Generate (prob [S], next0 [S], next1 [S]) int32 arrays.

    States = pairs (n0, n1) with n0, n1 <= max_count.  On observing bit b
    the own counter increments (saturating) and the opposite counter ages
    by age_num/age_den (adaptivity to non-stationarity).
    """
    side = max_count + 1
    idx = lambda n0, n1: n0 * side + n1
    S = side * side
    prob = np.empty(S, np.int32)
    nxt0 = np.empty(S, np.int32)
    nxt1 = np.empty(S, np.int32)
    for n0 in range(side):
        for n1 in range(side):
            p1 = (2 * n1 + 1) / (2 * (n0 + n1) + 2)  # KT estimator
            prob[idx(n0, n1)] = min(TOTAL - 1,
                                    max(1, int(round(p1 * TOTAL))))
            a0 = min(n0 + 1, max_count)
            d1 = (n1 * age_num) // age_den
            nxt0[idx(n0, n1)] = idx(a0, d1)
            a1 = min(n1 + 1, max_count)
            d0 = (n0 * age_num) // age_den
            nxt1[idx(n0, n1)] = idx(d0, a1)
    return prob, nxt0, nxt1


def initial_state() -> int:
    return 0  # (n0=0, n1=0) -> p = 1/2


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
