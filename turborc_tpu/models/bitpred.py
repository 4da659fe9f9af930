"""Adaptive bit predictors - the reference's L2 layer (SURVEY.md section 2.2).

Each predictor is a table of per-context counter state, stored per lane:
shape [L, N] where N is the context-slot count.  All arithmetic is exact
int32 (values fit 16 bits); shifts are arithmetic, mirroring the C.

- Simple ('s', mbc_s.h:30-55):  one 16-bit counter, RC_BITS=15,
    predict: p
    update:  p -= ((p - (bit ? 32768 : 0)) >> 5) + bit
- Dual-speed ('ss', mbc_ss.h:35-63): two 16-bit counters with rates
  (prm0, prm1); probability (p+q) >> (17-RC_BITS) -> here >> 2 since our
  binary coder runs at 15-bit precision with 16-bit counters:
    update bit=1: c += (c ^ 0xFFFF) >> rate ; bit=0: c -= c >> rate
- FSM ('sf', mbc_sf.h): state-machine table; see models/fsm.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

RC_BITS = 15
TOTAL = 1 << RC_BITS


def _gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [L, N], idx [L] -> [L]."""
    return jnp.take_along_axis(table, idx[:, None], axis=1)[:, 0]


def _scatter(table: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray):
    L = table.shape[0]
    return table.at[jnp.arange(L, dtype=jnp.int32), idx].set(val)


@dataclasses.dataclass(frozen=True)
class Simple:
    """One-counter predictor; rate fixed at 5 (mbc_s.h:53-55)."""
    rate: int = 5

    def init(self, L: int, N: int):
        return jnp.full((L, N), TOTAL // 2, jnp.int32)

    def predict(self, state, idx):
        return _gather(state, idx)

    def update(self, state, idx, p, bit):
        bit_i = bit.astype(jnp.int32)
        target = bit_i << RC_BITS
        newp = p - (((p - target) >> self.rate) + bit_i)
        return _scatter(state, idx, newp)


@dataclasses.dataclass(frozen=True)
class DualSpeed:
    """Two-counter predictor; rates tuned per order
    (mbc_ss.h:35 comment: o0:5,8 o1:4,6 o2:2,5 bwt:4,7)."""
    rate0: int = 5
    rate1: int = 8

    def init(self, L: int, N: int):
        # counters live in 16-bit space; init = 1<<15 => probability 1/2
        return jnp.full((L, N, 2), 1 << 15, jnp.int32)

    def predict(self, state, idx):
        pq = jnp.take_along_axis(state, idx[:, None, None], axis=1)[:, 0]
        return (pq[:, 0] + pq[:, 1]) >> 2  # (p+q) >> (17-RC_BITS)

    def update(self, state, idx, p, bit):
        L = state.shape[0]
        lanes = jnp.arange(L, dtype=jnp.int32)
        pq = state[lanes, idx]  # [L, 2]
        rates = jnp.array([self.rate0, self.rate1], jnp.int32)
        up = pq + ((pq ^ 0xFFFF) >> rates)
        down = pq - (pq >> rates)
        new = jnp.where(bit[:, None], up, down)
        return state.at[lanes, idx].set(new)


class Fsm:
    """FSM predictor ('sf'): per-context state-machine ids over a shared
    generated table (models/fsm.py; reference mbc_sf.h:44-75)."""

    def __init__(self):
        from turborc_tpu.models import fsm
        prob, nxt0, nxt1 = fsm.build_table()
        self._prob = jnp.asarray(prob)
        self._nxt0 = jnp.asarray(nxt0)
        self._nxt1 = jnp.asarray(nxt1)

    def init(self, L: int, N: int):
        from turborc_tpu.models import fsm
        return jnp.full((L, N), fsm.initial_state(), jnp.int32)

    def predict(self, state, idx):
        return self._prob[_gather(state, idx)]

    def update(self, state, idx, p, bit):
        sid = _gather(state, idx)
        nxt = jnp.where(bit, self._nxt1[sid], self._nxt0[sid])
        return _scatter(state, idx, nxt)

    # jit-cache key stability (the table is deterministic)
    def __hash__(self):
        return hash("fsm")

    def __eq__(self, other):
        return isinstance(other, Fsm)


def make(name: str, prm0: int | None = None, prm1: int | None = None):
    if name == "s":
        return Simple()
    if name == "ss":
        return DualSpeed(prm0 if prm0 is not None else 5,
                         prm1 if prm1 is not None else 8)
    if name == "sf":
        return Fsm()
    raise ValueError(f"unknown predictor {name!r}")
