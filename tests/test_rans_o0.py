"""Round-trip + golden-spec tests for the flagship adaptive-CDF rANS codec."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.codecs import rans_cdf_o0
from turborc_tpu.models import cdf16
from turborc_tpu.ops import rans


def _scalar_encode_chunk(chunk: np.ndarray):
    """Single-lane golden encoder: returns u16 word list."""
    hi_t = cdf16.init_np(())
    lo_t = cdf16.init_np((16,))
    enc = rans.ScalarEncoder()
    for b in chunk:
        hi, lo = int(b) >> 4, int(b) & 15
        enc.put(*cdf16.lookup_np(hi_t, hi))
        cdf16.update_np(hi_t, hi)
        row = lo_t[hi]
        enc.put(*cdf16.lookup_np(row, lo))
        cdf16.update_np(row, lo)
    return enc.flush()


def _scalar_decode_chunk(words, K: int):
    hi_t = cdf16.init_np(())
    lo_t = cdf16.init_np((16,))
    dec = rans.ScalarDecoder(words)
    out = np.empty(K, np.uint8)
    for i in range(K):
        hi = cdf16.search_np(hi_t, dec.value())
        dec.advance(*cdf16.lookup_np(hi_t, hi))
        cdf16.update_np(hi_t, hi)
        row = lo_t[hi]
        lo = cdf16.search_np(row, dec.value())
        dec.advance(*cdf16.lookup_np(row, lo))
        cdf16.update_np(row, lo)
        out[i] = (hi << 4) | lo
    return out


def test_scalar_spec_roundtrip(rng):
    chunk = rng.integers(0, 256, size=333).astype(np.uint8)
    words = _scalar_encode_chunk(chunk)
    np.testing.assert_array_equal(_scalar_decode_chunk(words, 333), chunk)


def test_lanes_match_scalar_spec(rng):
    """Every vectorized lane must byte-match the single-lane golden coder."""
    L, K = 8, 64
    block = rng.integers(0, 256, size=(L, K)).astype(np.int32)
    streams, lengths = rans_cdf_o0.encode_device(block, K)
    streams, lengths = np.asarray(streams), np.asarray(lengths)
    for l in range(L):
        words = _scalar_encode_chunk(block[l].astype(np.uint8))
        assert lengths[l] == len(words)
        np.testing.assert_array_equal(streams[l, :len(words)], words)


@pytest.mark.parametrize("name", ["random", "skewed", "runs", "zeros", "text"])
def test_block_roundtrip(corpora, name):
    data = corpora[name]
    payload = rans_cdf_o0.encode_block(data, lanes=16, step_quant=64)
    out = rans_cdf_o0.decode_block(payload, data.shape[0], lanes=16,
                                   step_quant=64)
    np.testing.assert_array_equal(out, data)


def test_lane_count_invariance_ratio(corpora):
    """More lanes must still round-trip; ratio changes only mildly."""
    data = corpora["skewed"]
    sizes = {}
    for lanes in (4, 16, 64):
        payload = rans_cdf_o0.encode_block(data, lanes=lanes, step_quant=32)
        out = rans_cdf_o0.decode_block(payload, data.shape[0], lanes=lanes,
                                       step_quant=32)
        np.testing.assert_array_equal(out, data)
        sizes[lanes] = len(payload)
    assert sizes[64] < data.shape[0]  # still compresses


@pytest.mark.parametrize("n", [0, 1, 5, 511, 512, 513, 70000])
def test_container_roundtrip_sizes(rng, n):
    data = rng.integers(0, 64, size=n).astype(np.uint8)
    cfg = CodecConfig(lanes=16, block_size=1 << 15, step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


def test_container_incompressible_fallback(rng):
    data = rng.integers(0, 256, size=4096).astype(np.uint8)
    cfg = CodecConfig(lanes=16, block_size=1 << 15, step_quant=64)
    blob = compress(data, cfg)
    # random bytes: container must not blow up beyond raw + headers
    assert len(blob) < 4096 + 256
    assert decompress(blob) == data.tobytes()


def test_container_detects_corruption(rng):
    data = rng.integers(0, 32, size=5000).astype(np.uint8)
    cfg = CodecConfig(lanes=16, block_size=1 << 15, step_quant=64)
    blob = bytearray(compress(data, cfg))
    blob[60] ^= 0xFF
    with pytest.raises(ValueError):
        decompress(bytes(blob))


def test_compression_ratio_on_skewed(corpora):
    data = corpora["skewed"]
    blob = compress(data, CodecConfig(lanes=16, block_size=1 << 15,
                                      step_quant=64))
    # zipf(1.3) over 256 symbols ~ 6.2 bits/sym entropy; demand < 7.6
    assert len(blob) < data.shape[0] * 0.95
