"""Turbo-VLC over CDF16 + rANS direct bits: round-trips and edge values."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.codecs import rans_vlc


def _cfg(codec):
    return CodecConfig(codec=codec, lanes=8, block_size=1 << 14,
                       step_quant=64)


@pytest.mark.parametrize("codec", ["rans-vn8", "rans-v16", "rans-v32"])
def test_roundtrip_geometric(rng, codec):
    data = np.clip(rng.geometric(0.2, 4000) - 1, 0, 255).astype(np.uint8)
    blob = compress(data, _cfg(codec))
    assert decompress(blob) == data.tobytes()


def test_v16_skewed_beats_raw(rng):
    vals = np.clip(rng.geometric(0.01, 3000), 0, 0xFFFF).astype("<u2")
    data = vals.view(np.uint8).copy()
    blob = compress(data, _cfg("rans-v16"))
    assert decompress(blob) == data.tobytes()
    assert len(blob) < len(data)


def test_v32_extreme_values(rng):
    vals = np.concatenate([
        np.zeros(64, "<u4"),
        np.full(64, 0xFFFFFFFF, "<u4"),
        np.uint32(1) << rng.integers(0, 32, 512).astype("<u4"),
        rng.integers(0, 1 << 62, 512).astype(np.uint64).astype("<u4"),
    ])
    data = vals.view(np.uint8).copy()
    blob = compress(data, _cfg("rans-v32"))
    assert decompress(blob) == data.tobytes()


def test_v32z_on_timestamps(rng):
    base = np.cumsum(rng.integers(1, 1000, 2000).astype(np.uint64))
    vals = base.astype("<u4")
    data = vals.view(np.uint8).copy()
    plain = compress(data, _cfg("rans-v32"))
    zz = compress(data, _cfg("rans-v32z"))
    assert decompress(zz) == data.tobytes()
    assert len(zz) < len(plain)


def test_exponent_split_scalar():
    """The (s, mant, m) split must cover the full u32 range bijectively."""
    import jax.numpy as jnp
    xs = np.array([0, 1, 7, 8, 9, 15, 16, 255, 256, 65535, 65536,
                   (1 << 31) - 1, 1 << 31, 0xFFFFFFFF], np.uint32)
    s, mant, m = rans_vlc._split(jnp.asarray(xs), 32)
    back = rans_vlc._join(s, mant)
    np.testing.assert_array_equal(np.asarray(back), xs)
    assert int(jnp.max(s)) <= 29
    # mantissa always fits its bit budget
    assert np.all(np.asarray(mant) < (np.uint64(1) << np.asarray(m,
                                                                 np.uint64)))
