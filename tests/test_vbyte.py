"""TurboByte group varint transform + rcv8 composition codecs."""
import numpy as np
import pytest

from turborc_tpu.transforms import vbyte


@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 1000])
def test_v8_16_roundtrip(n):
    rng = np.random.default_rng(n)
    v = rng.integers(0, 1 << 16, n).astype("<u2")
    assert np.array_equal(vbyte.v8dec16(vbyte.v8enc16(v)), v)


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 1000])
def test_v8_32_roundtrip(n):
    rng = np.random.default_rng(n)
    v = (rng.zipf(1.3, max(n, 1))[:n] % (1 << 32)).astype("<u4")
    assert np.array_equal(vbyte.v8dec32(vbyte.v8enc32(v)), v)


def test_v8_corrupt_raises():
    v = np.arange(100, dtype="<u2")
    buf = vbyte.v8enc16(v)
    with pytest.raises(ValueError):
        vbyte.v8dec16(buf[: len(buf) - 3])
    with pytest.raises(ValueError):
        vbyte.v8dec16(buf[:2])


@pytest.mark.parametrize("name", ["rcv8-16", "rcv8z-16", "rcv8-32",
                                  "rcv8z-32"])
def test_rcv8_codec_roundtrip(name):
    from turborc_tpu.codecs import registry
    c = registry.get(name)
    rng = np.random.default_rng(11)
    esize = 2 if "16" in name else 4
    vals = np.cumsum(rng.integers(0, 300, 4096)).astype(f"<u{esize}")
    data = np.frombuffer(vals.tobytes(), np.uint8)
    pay = c.encode_block(data, lanes=64)
    assert np.array_equal(c.decode_block(pay, data.shape[0], lanes=64),
                          data)
    # delta data compresses under the zigzag variants
    if name.startswith("rcv8z"):
        assert len(pay) < data.shape[0]
    with pytest.raises(ValueError):
        c.decode_block(pay[:3], data.shape[0], lanes=64)
