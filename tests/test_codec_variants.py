"""Round-trips for the long-tail codec variants: rcm2, rcrle1, rc4/rc4c."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress


def _cfg(codec, **kw):
    return CodecConfig(codec=codec, lanes=8, block_size=1 << 13,
                       step_quant=64, **kw)


@pytest.mark.parametrize("codec", ["rcm2", "rcrle1"])
def test_roundtrip_runs(corpora, codec):
    data = corpora["runs"][:6000]
    blob = compress(data, _cfg(codec))
    assert decompress(blob) == data.tobytes()


@pytest.mark.parametrize("codec", ["rcm2", "rcrle1", "rc4", "rc4c"])
def test_roundtrip_skewed(corpora, codec):
    data = corpora["skewed"][:6000]
    blob = compress(data, _cfg(codec))
    assert decompress(blob) == data.tobytes()
    assert len(blob) < data.shape[0]


def test_rc4_on_nibble_packed(rng):
    """4-bit alphabet data: rc4's natural domain."""
    nibs = np.clip(rng.geometric(0.4, 8000) - 1, 0, 15).astype(np.uint8)
    data = ((nibs[::2] << 4) | nibs[1::2]).astype(np.uint8)
    for codec in ("rc4", "rc4c"):
        blob = compress(data, _cfg(codec))
        assert decompress(blob) == data.tobytes()
        assert len(blob) < data.shape[0]


def test_rc16_roundtrip(rng):
    vals = np.clip(rng.geometric(0.002, 3000), 0, 0xFFFF).astype("<u2")
    data = vals.view(np.uint8).copy()
    blob = compress(data, _cfg("rc-16"))
    assert decompress(blob) == data.tobytes()
    assert len(blob) < len(data)


def test_rcrle1_beats_rcrle_on_runs(corpora):
    data = corpora["runs"][:8000]
    o0 = compress(data, _cfg("rcrle"))
    o1 = compress(data, _cfg("rcrle1"))
    assert decompress(o1) == data.tobytes()
    # order-1 literals + run-history context should win on BWT-like input
    assert len(o1) <= len(o0) * 1.02
