"""Bitwise (binary-rANS) codec family tests: golden spec + round-trips."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.codecs import rc_bit
from turborc_tpu.ops import rans

RC_BITS = 15
TOTAL = 1 << RC_BITS


class ScalarSimple:
    def __init__(self, n):
        self.t = np.full(n, TOTAL // 2, np.int64)

    def predict(self, i):
        return max(1, min(TOTAL - 1, int(self.t[i])))

    def update(self, i, p, bit):
        self.t[i] = p - (((p - (bit << RC_BITS)) >> 5) + bit)


def _scalar_encode(chunk, order=0):
    pred = ScalarSimple(256 * (256 if order else 1))
    enc = rans.ScalarEncoder()
    ctx = 0
    for b in chunk:
        b = int(b)
        node = 1
        for i in range(7, -1, -1):
            idx = ctx * 256 + node
            p = pred.predict(idx)
            bit = (b >> i) & 1
            enc.put(0 if bit else p, p if bit else TOTAL - p)
            pred.update(idx, p, bit)
            node = (node << 1) | bit
        ctx = b if order else 0
    return enc.flush()


def test_lanes_match_scalar_spec(rng):
    L, K = 4, 64
    block = rng.integers(0, 256, size=(L, K)).astype(np.int32)
    for order in (0, 1):
        streams, lengths = rc_bit.encode_device(block, K, order, "s")
        streams, lengths = np.asarray(streams), np.asarray(lengths)
        for l in range(L):
            words = _scalar_encode(block[l], order)
            assert lengths[l] == len(words)
            np.testing.assert_array_equal(streams[l, :len(words)], words)


@pytest.mark.parametrize("codec", ["rc-o0", "rcc-o1", "rc-o0-ss", "rcc-o1-ss"])
@pytest.mark.parametrize("name", ["skewed", "runs", "text"])
def test_roundtrip(corpora, codec, name):
    data = corpora[name][:6000]
    cfg = CodecConfig(codec=codec, lanes=8, block_size=1 << 14, step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


def test_order1_beats_order0_on_text(corpora):
    # full 18KB text: the round-4 compile-reuse truncation to 6000 bytes
    # broke the property (750 bytes/lane cannot warm the o1 tables) and
    # went unnoticed because the suite was not re-run after that commit
    data = corpora["text"]
    cfg0 = CodecConfig(codec="rc-o0", lanes=8, block_size=1 << 15,
                       step_quant=64)
    cfg1 = CodecConfig(codec="rcc-o1", lanes=8, block_size=1 << 15,
                       step_quant=64)
    s0, s1 = len(compress(data, cfg0)), len(compress(data, cfg1))
    assert s1 < s0 < data.shape[0]
