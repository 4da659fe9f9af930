"""16-bit-symbol RLE codecs (reference rcrle/rcrle1 enc16/dec16,
rc_.c:880-988): roundtrip + structure checks for rcrle-16/rcrle1-16."""
import numpy as np
import pytest

from turborc_tpu.codecs import rle


@pytest.fixture(scope="module")
def u16_runny():
    rng = np.random.default_rng(3)
    vals = rng.choice(np.array([258, 772, 513, 65535, 0, 10000], np.uint16),
                      2500, p=[.4, .2, .2, .1, .05, .05])
    return np.repeat(vals, rng.integers(1, 9, vals.size)).astype(
        "<u2").view(np.uint8)


@pytest.mark.parametrize("order1", [False, True])
def test_rle16_roundtrip(u16_runny, order1):
    enc, dec = rle.make_block_api16(order1)
    for n in (u16_runny.shape[0], u16_runny.shape[0] - 1, 3, 1, 0):
        d = u16_runny[:n]
        pay = enc(d, lanes=32, step_quant=64)
        assert np.array_equal(dec(pay, n, lanes=32, step_quant=64), d)


def test_rle16_compresses_wide_runs(u16_runny):
    # run-structured u16 data (the 16-bit BWT output class this codec
    # exists for) must compress well below byte-RLE's reach on the same
    # bytes: the u16 run heads alias to 2 alternating bytes under a u8
    # view, which breaks byte-run detection
    n = u16_runny.shape[0]
    pay16 = rle.encode_block16(u16_runny, lanes=32, step_quant=64)
    assert len(pay16) < n / 3


def test_rle16_registry():
    from turborc_tpu.codecs.registry import get
    for name in ("rcrle-16", "rcrle1-16"):
        c = get(name)
        data = np.tile(np.array([1, 2, 3, 3], np.uint8), 400)
        pay = c.encode_block(data, lanes=32, step_quant=64)
        assert np.array_equal(
            c.decode_block(pay, data.shape[0], lanes=32, step_quant=64),
            data)
