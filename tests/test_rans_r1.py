"""Order-1 rank-context rANS (rans-cdf-r1, ids 59/60): XLA-twin
semantics, round-trips, and the order-1 modelling advantage."""
import numpy as np
import pytest

from turborc_tpu.codecs import rans_cdf_o0, rans_cdf_r1


@pytest.mark.parametrize("name", ["skewed", "runs", "text", "zeros"])
def test_roundtrip_corpora(corpora, name):
    data = corpora[name]
    pay = rans_cdf_r1.encode_block(data, lanes=64, step_quant=8)
    out = rans_cdf_r1.decode_block(pay, data.shape[0], lanes=64,
                                   step_quant=8)
    assert np.array_equal(out, data)


def test_roundtrip_empty_and_tiny():
    for n in (0, 1, 7):
        data = np.arange(n, dtype=np.uint8)
        pay = rans_cdf_r1.encode_block(data, lanes=8, step_quant=8)
        out = rans_cdf_r1.decode_block(pay, n, lanes=8, step_quant=8)
        assert np.array_equal(out, data)


def _markov_bytes(rng, n, stick=0.85):
    """Strongly order-1 data: next byte = prev with prob `stick`, else a
    fresh draw from a 32-symbol skewed alphabet."""
    p = 1.0 / np.arange(1, 33) ** 1.2
    p /= p.sum()
    fresh = rng.choice(32, size=n, p=p).astype(np.uint8)
    keep = rng.random(n) < stick
    out = fresh.copy()
    for i in range(1, n):
        if keep[i]:
            out[i] = out[i - 1]
    return out


def test_o1_beats_o0_on_markov_data(rng):
    data = _markov_bytes(rng, 1 << 16)
    pay_r1 = rans_cdf_r1.encode_block(data, lanes=64, step_quant=8)
    pay_o0 = rans_cdf_o0.encode_block(data, lanes=64, step_quant=8)
    assert len(pay_r1) < 0.85 * len(pay_o0), (len(pay_r1), len(pay_o0))
    out = rans_cdf_r1.decode_block(pay_r1, data.shape[0], lanes=64,
                                   step_quant=8)
    assert np.array_equal(out, data)


def test_corrupt_payload_rejected(corpora):
    data = corpora["skewed"]
    pay = rans_cdf_r1.encode_block(data, lanes=64, step_quant=8)
    with pytest.raises(ValueError):
        rans_cdf_r1.decode_block(pay[:100], data.shape[0], lanes=64,
                                 step_quant=8)
    # blow up a lane-length entry (past perm + packed warm tables)
    from turborc_tpu.codecs import blockio
    _, consumed = blockio.unpack_codes(pay[256:], 1,
                                       n_entries=rans_cdf_r1.N_ENTRIES)
    bad = bytearray(pay)
    bad[256 + consumed] = 0xFF
    bad[256 + consumed + 1] = 0xFF
    with pytest.raises(ValueError):
        rans_cdf_r1.decode_block(bytes(bad), data.shape[0], lanes=64,
                                 step_quant=8)


def test_registry_ids():
    from turborc_tpu.codecs import registry
    registry._lazy_init()
    assert registry.get(59).name == "rans-cdf-r1"
    assert registry.get(61).name == "rans-auto"


def test_auto_dispatch(rng, corpora):
    from turborc_tpu.codecs import rans_auto
    runs = corpora["runs"]      # strong prev->cur coupling -> r1 arm
    skew = corpora["skewed"]    # iid -> s8 arm (held-out gain ~ -0.15)
    assert rans_auto.o1_gain(runs) >= rans_auto.GAIN_THRESHOLD
    assert rans_auto.o1_gain(skew) < rans_auto.GAIN_THRESHOLD
    for data, tag in ((runs, 1), (skew, 0)):
        pay = rans_auto.encode_block(data, lanes=64, step_quant=64)
        assert pay[0] == tag
        out = rans_auto.decode_block(pay, data.shape[0], lanes=64,
                                     step_quant=64)
        assert np.array_equal(out, data)
    with pytest.raises(ValueError):
        rans_auto.decode_block(b"\x07rest", 10)
    # container path end-to-end
    from turborc_tpu import CodecConfig, compress, decompress
    blob = compress(runs, CodecConfig(codec="rans-auto", lanes=64,
                                      block_size=1 << 17, step_quant=64))
    assert decompress(blob) == runs.tobytes()
