"""Runtime-geometry coverage (round 3, VERDICT item 4).

The flagship family's format knobs (groups/chunk/share/sync/lsync/arows)
are runtime arguments threaded through the kernels and codecs and
recorded in the v3 container header - NOT env-var module constants.
These tests prove a container written at any knob setting decodes in a
process whose env-default geometry is DIFFERENT (the round-2 failure
mode: a blob written under non-default TRC_* knobs failed to decode
elsewhere with a generic "length table inconsistent" error).
"""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

from turborc_tpu.ops.pallas.geom import Geom

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "turborc_tpu", "bench", "_data", "textbwt_32768.bin")


@pytest.fixture(scope="module")
def textbwt():
    return np.fromfile(_DATA, np.uint8)


def test_geom_wire_roundtrip():
    for g in (Geom(), Geom(share=1), Geom(groups=128, arows=4),
              Geom(groups=2, chunk=2, share=2, sync=2, lsync=4, arows=8),
              Geom(groups=16, chunk=16, share=64, sync=16, lsync=64),
              Geom(nstates=2), Geom(groups=2, chunk=2, share=2, sync=2,
                                    lsync=4, arows=8, nstates=2)):
        assert Geom.unpack(g.pack()) == g
    # split-state spec notation survives the parse/spec/pack cycle
    gx = Geom.parse("g32c8s8y2l32a16r4x2")
    assert gx.nstates == 2 and gx.spec.endswith("x2")
    assert Geom.unpack(gx.pack()) == gx
    # adaptation-rate knob (r05): wire + spec roundtrip, default elided
    gu = Geom.parse("g8c8s8y2l32a16r4u8")
    assert gu.rate == 8 and gu.spec.endswith("u8")
    assert Geom.unpack(gu.pack()) == gu
    assert Geom(rate=10) == Geom.unpack(Geom(rate=10).pack())
    assert "u" not in Geom().spec


def test_geom_validation():
    # unrepresentable-in-header geometries fail loudly at construction
    # (ADVICE r03: g48/c12/l24 used to silently pack as g32/c8/l16)
    for bad in (dict(share=3), dict(chunk=8, sync=3), dict(lsync=12),
                dict(arows=17), dict(groups=48), dict(chunk=12),
                dict(lsync=24, chunk=8, sync=4), dict(srows=32),
                dict(sync=2, chunk=2, lsync=24), dict(rate=6),
                dict(rate=11)):
        with pytest.raises(ValueError):
            Geom(**bad)
    with pytest.raises(ValueError):
        Geom.parse("g48c8s8y8l32a4")


def test_s8_cross_geometry_roundtrip(textbwt):
    """Encode at explicit non-default geometries; decode with only the
    geometry args (no env)."""
    from turborc_tpu.codecs import rans_cdf_s8 as S8
    data = textbwt
    base = dict(lanes=256, step_quant=32)
    payloads = {}
    for share, arows in ((8, 16), (1, 16), (8, 4), (4, 8)):
        g = Geom(share=share, arows=arows)
        payloads[(share, arows)] = S8.encode_block(data, geom=g, **base)
    for (share, arows), pay in payloads.items():
        g = Geom(share=share, arows=arows)
        out = S8.decode_block(pay, data.shape[0], geom=g, **base)
        assert np.array_equal(out, data), (share, arows)
    # distinct geometries produce distinct payloads (the knobs are real)
    assert len({p for p in payloads.values()}) == len(payloads)


def test_rate_knob_roundtrip(textbwt):
    """rate=8 payloads roundtrip and take a DIFFERENT model trajectory
    than rate=7 (the knob is format-relevant and must ride the wire)."""
    from turborc_tpu.codecs import rans_cdf_s8
    g7 = Geom.parse("g2c8s8y2l32a16r4")
    g8 = Geom.parse("g2c8s8y2l32a16r4u8")
    p7 = rans_cdf_s8.encode_block(textbwt, lanes=256, geom=g7)
    p8 = rans_cdf_s8.encode_block(textbwt, lanes=256, geom=g8)
    assert p7 != p8
    out = rans_cdf_s8.decode_block(p8, textbwt.shape[0], lanes=256,
                                   geom=g8)
    assert np.array_equal(out, textbwt)


def test_container_records_geometry(textbwt):
    """api.compress at a non-default geometry -> header carries it ->
    api.decompress needs no env/geom hints."""
    from turborc_tpu import api
    from turborc_tpu.container import format as fmt
    from turborc_tpu.utils.config import CodecConfig

    data = textbwt
    g = Geom(share=1, arows=8)
    cfg = CodecConfig(codec="rans-cdf-s8", lanes=256, step_quant=32,
                      block_size=1 << 18, geom=g)
    blob = api.compress(data, cfg)
    hdr = fmt.read_header(blob)
    assert hdr["geom"] == g
    out = np.frombuffer(api.decompress(blob), np.uint8)
    assert np.array_equal(out, data)


def test_container_decodes_under_foreign_env(textbwt, tmp_path):
    """The round-2 failure mode: a container written at share=1 must
    decode in a FRESH process whose TRC_* env says share=8 (the default).
    The v3 header carries the truth."""
    from turborc_tpu import api
    from turborc_tpu.utils.config import CodecConfig

    data = textbwt[:32768]
    g = Geom(share=1, sync=2, lsync=16, arows=8)
    cfg = CodecConfig(codec="rans-cdf-s8", lanes=256, step_quant=32,
                      block_size=1 << 18, geom=g)
    blob = api.compress(data, cfg)
    p = tmp_path / "x.trct"
    p.write_bytes(blob)
    d = tmp_path / "orig.bin"
    d.write_bytes(data.tobytes())

    env = dict(os.environ)
    env.update(TRC_SHARE="8", TRC_SYNC="4", TRC_LSYNC="32",
               TRC_AROWS="16", JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    script = (
        "import numpy as np\n"
        "from turborc_tpu import api\n"
        f"blob = open({str(p)!r}, 'rb').read()\n"
        f"want = open({str(d)!r}, 'rb').read()\n"
        "assert api.decompress(blob) == want\n"
        "print('foreign-env decode ok')\n")
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=1800,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, f"STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}"
    assert "foreign-env decode ok" in r.stdout


def test_auto_share_arm():
    """rans-auto's share-1 arm: long-run data with the o1 arm disabled
    by a tiny block still round-trips through tag 2."""
    from turborc_tpu.codecs import rans_auto

    rng = np.random.default_rng(3)
    runs = np.repeat(rng.integers(0, 250, 3000),
                     rng.integers(2, 9, 3000)).astype(np.uint8)[:12000]
    assert rans_auto.mean_run(runs) >= rans_auto.RUN_THRESHOLD
    pay = rans_auto.encode_block(runs, lanes=256, step_quant=32)
    out = rans_auto.decode_block(pay, runs.shape[0], lanes=256,
                                 step_quant=32)
    assert np.array_equal(out, runs)
    if pay[0] == 2:  # share-1 arm chosen: decode must NOT need env hints
        g1 = dataclasses.replace(Geom(), share=1)
        from turborc_tpu.codecs import rans_cdf_s8 as S8
        out2 = S8.decode_block(pay[1:], runs.shape[0], lanes=256,
                               step_quant=32, geom=g1)
        assert np.array_equal(out2, runs)
