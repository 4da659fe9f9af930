"""Host-stage unit tests: UTF-8 remap, negabinary, BWT+utf8 pipeline."""
import numpy as np
import pytest

from turborc_tpu.host import native
from turborc_tpu.transforms import delta


def _u8(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8"), np.uint8).copy()


def test_utf8_roundtrip_ascii_and_cjk():
    text = ("hello world " * 50 + "你好世界" * 100
            + "café " * 30 + "\U0001F600" * 5)
    data = _u8(text)
    mapped = native.utf8_remap(data)
    assert mapped is not None
    back = native.utf8_unmap(mapped, data.shape[0])
    np.testing.assert_array_equal(back, data)


def test_utf8_shrinks_multibyte_text():
    # CJK text: 3 bytes/char in UTF-8, small alphabet -> 1-byte ids
    data = _u8("你好世界和平" * 500)
    mapped = native.utf8_remap(data)
    assert mapped is not None and mapped.shape[0] < data.shape[0] / 2
    np.testing.assert_array_equal(
        native.utf8_unmap(mapped, data.shape[0]), data)


def test_utf8_rejects_binary(rng):
    data = rng.integers(0, 256, 4096).astype(np.uint8)
    data[0] = 0xFF  # guaranteed invalid lead byte
    assert native.utf8_remap(data) is None


def test_utf8_rejects_overlong():
    # 0xC0 0xAF is an overlong '/' - must be rejected, not normalized
    assert native.utf8_remap(np.array([0xC0, 0xAF], np.uint8)) is None


@pytest.mark.parametrize("esize", [1, 2, 4])
def test_negabinary_inverts(rng, esize):
    data = rng.integers(0, 256, 1024).astype(np.uint8)
    out = delta.negabinary_dec(delta.negabinary_enc(data, esize), esize)
    np.testing.assert_array_equal(out, data)


def test_bwt_pipeline_uses_utf8(rng):
    from turborc_tpu import CodecConfig, compress, decompress
    text = ("你好世界 compression test " * 300)
    data = _u8(text)
    cfg = CodecConfig(codec="rcbwt", lanes=8, block_size=1 << 15,
                      step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()
