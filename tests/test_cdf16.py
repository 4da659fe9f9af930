"""CDF16 model: JAX vector form must match the scalar numpy spec exactly."""
import jax.numpy as jnp
import numpy as np

from turborc_tpu.models import cdf16


def test_init_matches_reference_staircase():
    t = np.asarray(cdf16.init((3,)))
    assert t.shape == (3, 16)
    assert (t[0] == np.arange(16) << 11).all()


def test_vector_update_matches_scalar_spec(rng):
    L = 64
    tables = cdf16.init_np((L,))
    jt = cdf16.init((L,))
    syms = rng.integers(0, 16, size=(500, L))
    for step in range(syms.shape[0]):
        s = syms[step]
        lows = tables[np.arange(L), s].copy()
        for l in range(L):
            cdf16.update_np(tables[l], int(s[l]))
        jlow, _ = cdf16.lookup(jt, jnp.asarray(s))
        np.testing.assert_array_equal(np.asarray(jlow), lows)
        jt = cdf16.update(jt, jlow)
    np.testing.assert_array_equal(np.asarray(jt), tables)


def test_update_keeps_table_valid(rng):
    """freq >= 1 for every symbol, entries within [0, 32768)."""
    t = cdf16.init_np(())
    # adversarial: hammer a single symbol so others decay
    for _ in range(5000):
        cdf16.update_np(t, 7)
    full = np.concatenate([t, [cdf16.TOTAL]])
    assert (np.diff(full) >= 1).all(), full
    assert t[0] == 0 and t[-1] < cdf16.TOTAL

    for _ in range(3000):
        cdf16.update_np(t, 0)
    full = np.concatenate([t, [cdf16.TOTAL]])
    assert (np.diff(full) >= 1).all(), full


def test_search_inverts_lookup(rng):
    t = cdf16.init_np(())
    for _ in range(200):
        cdf16.update_np(t, int(rng.integers(0, 16)))
    jt = jnp.asarray(t)[None, :]
    for sym in range(16):
        low, freq = cdf16.lookup_np(t, sym)
        for v in (low, low + freq - 1):
            s, jl, jf = cdf16.search(jt, jnp.asarray([v], jnp.int32))
            assert int(s[0]) == sym == cdf16.search_np(t, v)
            assert int(jl[0]) == low and int(jf[0]) == freq
