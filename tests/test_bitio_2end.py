"""R->L bitstream spec/vector parity and the two-ended rcv codec."""
import numpy as np
import pytest

from turborc_tpu.ops import bitio


def test_pack_matches_sequential_spec():
    rng = np.random.default_rng(11)
    nbits = rng.integers(1, 17, 200)
    values = np.array([int(rng.integers(0, 1 << b)) for b in nbits],
                      np.uint32)
    put = bitio.BitPutR()
    for v, b in zip(values, nbits):
        put.put(int(v), int(b))
    assert put.tobytes() == bitio.pack_r2l(values, nbits)


def test_unpack_matches_sequential_spec_and_roundtrips():
    rng = np.random.default_rng(12)
    nbits = rng.integers(1, 15, 333)
    values = np.array([int(rng.integers(0, 1 << b)) for b in nbits],
                      np.uint32)
    buf = b"\xAA\xBB" + bitio.pack_r2l(values, nbits)  # leading foreign data
    assert np.array_equal(bitio.unpack_r2l(buf, nbits), values)
    get = bitio.BitGetR(buf, int(nbits.sum()))
    seq = [get.get(int(b)) for b in nbits]
    assert np.array_equal(np.array(seq, np.uint32), values)


def test_unpack_underflow_raises():
    with pytest.raises(ValueError):
        bitio.unpack_r2l(b"\x01", np.array([64, 64]))


def test_rcv_2e_roundtrip_and_ratio():
    from turborc_tpu.codecs import registry
    c = registry.get("rcv-2e")
    rng = np.random.default_rng(5)
    # small skewed 16-bit integers: exponent stage should compress well
    vals = (rng.zipf(1.5, 4096) % 50000).astype("<u2")
    data = np.frombuffer(vals.tobytes(), np.uint8)
    payload = c.encode_block(data, lanes=16)
    out = c.decode_block(payload, data.shape[0], lanes=16)
    assert np.array_equal(out, data)
    assert len(payload) < data.shape[0]


def test_rcv_2e_odd_length_and_corrupt():
    from turborc_tpu.codecs import registry
    c = registry.get("rcv-2e")
    data = np.arange(1001, dtype=np.uint8) % 7
    payload = c.encode_block(data, lanes=8)
    assert np.array_equal(c.decode_block(payload, 1001, lanes=8), data)
    with pytest.raises(ValueError):
        c.decode_block(payload[:10], 1001, lanes=8)
