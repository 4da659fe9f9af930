"""Data-parallel block sharding over the virtual 8-device CPU mesh."""
import jax
import numpy as np

from turborc_tpu.codecs import rans_cdf_o0 as C
from turborc_tpu.parallel import mesh as pmesh


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_roundtrip_matches_single_device(rng):
    mesh = pmesh.make_mesh()
    L, K = 16, 64
    B = 2 * len(jax.devices())
    blocks = rng.integers(0, 64, size=(B, L, K)).astype(np.int32)

    streams, lengths = pmesh.encode_blocks(blocks, K, C.encode_device, mesh)
    out = pmesh.decode_blocks(streams, K, C.decode_device, mesh)
    np.testing.assert_array_equal(out, blocks)

    # single-device result must be byte-identical (lane-count invariance of
    # the sharding axis: block DP cannot change the payload)
    s0, l0 = C.encode_device(blocks[0], K)
    np.testing.assert_array_equal(streams[0], np.asarray(s0))
    np.testing.assert_array_equal(lengths[0], np.asarray(l0))


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    g.dryrun_multichip(4)
