"""Context-mixing + QLFC codec round-trips."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.host import native


@pytest.mark.parametrize("codec", ["rcm", "rcmr", "rcmrr", "rcqlfc"])
def test_roundtrip(corpora, codec):
    data = corpora["text"][:6000]
    cfg = CodecConfig(codec=codec, lanes=8, block_size=1 << 14, step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()
    assert len(blob) < data.shape[0]


def test_mixer_beats_plain_o1_on_text(corpora):
    data = corpora["text"][:8000]
    mix = compress(data, CodecConfig(codec="rcm", lanes=8,
                                     block_size=1 << 14, step_quant=64))
    o1 = compress(data, CodecConfig(codec="rcc-o1", lanes=8,
                                    block_size=1 << 14, step_quant=64))
    assert len(mix) < len(o1)


def test_mtf_roundtrip(rng):
    data = rng.integers(0, 256, 5000).astype(np.uint8)
    np.testing.assert_array_equal(native.unmtf(native.mtf(data)), data)
    assert native.mtf(np.full(100, 7, np.uint8))[1:].max() == 0
