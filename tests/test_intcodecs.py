"""Integer coder family: gamma/rice/vlc/u3/rle round-trips + transforms."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.transforms import delta


@pytest.mark.parametrize("codec", ["rcg-8", "rcr-8", "rcv-8", "rcu3",
                                   "rcrle"])
def test_roundtrip_geometric(rng, codec):
    data = np.clip(rng.geometric(0.15, 4000) - 1, 0, 255).astype(np.uint8)
    cfg = CodecConfig(codec=codec, lanes=8, block_size=1 << 14, step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()
    assert len(blob) < data.shape[0]


@pytest.mark.parametrize("codec", ["rcg-16", "rcrz-16", "rcgz-8"])
def test_roundtrip_wider(rng, codec):
    base = np.cumsum(rng.integers(-20, 21, 2000)).astype("<u2")
    data = base.view(np.uint8).copy()
    cfg = CodecConfig(codec=codec, lanes=8, block_size=1 << 14, step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


def test_zigzag_helps_smooth_data(rng):
    base = np.cumsum(rng.integers(-3, 4, 4000)).astype("<u2")
    data = base.view(np.uint8).copy()
    plain = compress(data, CodecConfig(codec="rcg-16", lanes=8,
                                       block_size=1 << 14, step_quant=64))
    zz = compress(data, CodecConfig(codec="rcgz-16", lanes=8,
                                    block_size=1 << 14, step_quant=64))
    assert len(zz) < len(plain)


def test_rle_on_runs(corpora):
    data = corpora["runs"][:8000]
    cfg = CodecConfig(codec="rcrle", lanes=8, block_size=1 << 14,
                      step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


@pytest.mark.parametrize("esize", [1, 2, 4])
def test_transforms_invert(rng, esize):
    data = rng.integers(0, 256, 1000 + esize - 1).astype(np.uint8)
    for enc, dec in ((delta.delta_enc, delta.delta_dec),
                     (delta.zigzag_enc, delta.zigzag_dec),
                     (delta.xor_enc, delta.xor_dec)):
        np.testing.assert_array_equal(dec(enc(data, esize), esize), data)
