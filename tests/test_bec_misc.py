"""bec (M99-style), FSM predictor codecs, LZP, transpose, floatq."""
import numpy as np
import pytest

from turborc_tpu import CodecConfig, compress, decompress
from turborc_tpu.host import native
from turborc_tpu.transforms import floatq, transpose


def test_bec_roundtrip(corpora):
    for name in ("runs", "zeros", "text"):
        data = corpora[name][:4096]
        cfg = CodecConfig(codec="bec", lanes=8, block_size=1 << 13,
                          step_quant=256)
        blob = compress(data, cfg)
        assert decompress(blob) == data.tobytes()


def test_bec_compresses_runs(corpora):
    data = corpora["runs"][:8192]
    blob = compress(data, CodecConfig(codec="bec", lanes=8,
                                      block_size=1 << 13, step_quant=256))
    assert len(blob) < data.shape[0]


def test_bec_wavelet_roundtrip_and_wins(corpora):
    """bec (wavelet): prefix-permuted planes must round-trip and beat the
    independent-plane bec-i on skewed data (the inter-plane mutual
    information it exists to capture)."""
    data = corpora["skewed"][:8192]
    cfgs = {name: CodecConfig(codec=name, lanes=8, block_size=1 << 13,
                              step_quant=256) for name in ("bec-i", "bec")}
    blob_w = compress(data, cfgs["bec"])
    assert decompress(blob_w) == data.tobytes()
    assert len(blob_w) < len(compress(data, cfgs["bec-i"]))


def test_bec_wide_segment_roundtrip():
    """K >= 2^17 regression: constraint intervals wider than 2^16 used
    to get truncated code widths (_bitlen_ceil capped at 16 steps) and
    the packer undersized its word buffer, silently corrupting every
    block with >= 2^17 symbols per lane.

    Own rng (not the session fixture): the data must not depend on how
    many draws earlier tests consumed, and this seed's run lengths are
    verified to cover the 4<<17 target."""
    rng = np.random.default_rng(0xBEC2)
    data = np.repeat(rng.integers(0, 8, 2112).astype(np.uint8),
                     rng.integers(1, 513, 2112))[:4 << 17]
    assert data.shape[0] == 4 << 17
    for codec in ("bec", "bec-i"):
        cfg = CodecConfig(codec=codec, lanes=4, block_size=1 << 20,
                          step_quant=256)
        blob = compress(data, cfg)
        assert decompress(blob) == data.tobytes()


def test_fsm_codec_roundtrip(corpora):
    data = corpora["text"][:4000]
    cfg = CodecConfig(codec="rcc-o1-sf", lanes=8, block_size=1 << 13,
                      step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


def test_rans_o1_roundtrip(corpora):
    data = corpora["text"][:6000]
    cfg = CodecConfig(codec="rans-cdf-o1", lanes=8, block_size=1 << 13,
                      step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()


def test_lzp_roundtrip(rng):
    rep = np.frombuffer(b"the same phrase again and again. " * 500,
                        np.uint8).copy()
    lz = native.lzp(rep, 32)
    assert lz is not None and lz.shape[0] < rep.shape[0] // 4
    np.testing.assert_array_equal(native.unlzp(lz, rep.shape[0], 32), rep)
    # escape-byte stress
    esc = np.frombuffer(b"\xff" * 300 + b"x\xff" * 200, np.uint8).copy()
    lz = native.lzp(esc, 32)
    if lz is not None:
        np.testing.assert_array_equal(native.unlzp(lz, esc.shape[0], 32),
                                      esc)


def test_transpose_invertible(rng):
    d = rng.integers(0, 256, 1003).astype(np.uint8)
    for es in (2, 3, 4, 8):
        np.testing.assert_array_equal(
            transpose.tpdec(transpose.tpenc(d, es), es), d)
    np.testing.assert_array_equal(
        transpose.tpdec2d(transpose.tpenc2d(d, 10, 25, 4), 10, 25, 4), d)


def test_floatq(rng):
    x = rng.normal(0, 5, 2000).astype(np.float32)
    q, prm = floatq.fpquant_enc(x, 16)
    back = floatq.fpquant_dec(q, prm)
    st = floatq.fpstat(x, back)
    assert st["nrmse"] < 1e-3
    xr = floatq.fprazor(x, 12)
    assert floatq.fpstat(x, xr)["max_abs"] < 0.02
    np.testing.assert_array_equal(floatq.fprazor(x, 23), x)


def test_bec_native_py_parity(corpora, rng, monkeypatch):
    """Native (host/bec.cpp) and numpy-spec bec-w coders must be
    byte-identical and cross-decodable (ADVICE r03: the comment in
    host/bec.cpp claimed this test existed; now it does)."""
    from turborc_tpu.codecs import bec

    assert bec._native_becw() is not None, "native bec coder unavailable"
    for data in (corpora["skewed"][:8192],
                 corpora["text"][:8192],
                 rng.integers(0, 256, 8192).astype(np.uint8)):
        pay_nat = bec.encode_block_w(data, lanes=8, step_quant=256)
        monkeypatch.setenv("TRC_BEC_HOST", "py")
        pay_py = bec.encode_block_w(data, lanes=8, step_quant=256)
        assert pay_nat == pay_py
        # cross-decode: numpy decodes the native payload...
        out_py = bec.decode_block_w(pay_nat, data.shape[0], lanes=8,
                                    step_quant=256)
        monkeypatch.delenv("TRC_BEC_HOST")
        # ...and native decodes the numpy payload
        out_nat = bec.decode_block_w(pay_py, data.shape[0], lanes=8,
                                     step_quant=256)
        np.testing.assert_array_equal(out_py, data)
        np.testing.assert_array_equal(out_nat, data)
