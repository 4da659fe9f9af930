"""FSM predictor table parity with the reference (VERDICT r04 item 8).

tests/golden/rcsf_*.stream were pumped from the reference binary's own
rcsfenc/rcsfdec (bench/golden_sf.sh) running the shipped FSM1.txt table.
These tests load that SAME table (from the read-only reference tree;
skipped when absent) through models.fsm.load_reference_table and pin
byte-for-byte stream parity of the sf spec coder and the device RC path
at lanes=1.  The GENERATED table (fsm.build_table) stays the default for
users without a reference table.
"""
import pathlib

import numpy as np
import pytest

from turborc_tpu.models import fsm
from turborc_tpu.ops import rangecoder as rc

GOLDEN = pathlib.Path(__file__).parent / "golden"
FSM1 = pathlib.Path("/root/reference/FSM1.txt")

pytestmark = pytest.mark.skipif(
    not FSM1.exists(), reason="reference FSM1.txt not available")


@pytest.fixture(scope="module")
def tables():
    return fsm.load_reference_table(FSM1.read_text())


def _pair(name):
    raw = np.fromfile(GOLDEN / f"rcs_{name}.raw", np.uint8)
    gold = (GOLDEN / f"rcsf_{name}.stream").read_bytes()
    return raw, gold


def test_load_reference_table_shape(tables):
    prob, nxt0, nxt1 = tables
    assert prob.shape == (fsm.N_STATES,)
    # parsed states carry clamped probabilities; tail states stay zero
    assert prob[:32665].min() >= 1 and prob.max() < fsm.TOTAL
    assert nxt0.max() < fsm.N_STATES and nxt1.max() < fsm.N_STATES
    assert fsm.reference_initial_state() == 0


@pytest.mark.parametrize("name", ["runs", "text"])
def test_spec_sf_encode_matches_reference(name, tables):
    raw, gold = _pair(name)
    assert rc.spec_encode_sf(raw, tables) == gold


@pytest.mark.parametrize("name", ["runs", "text"])
def test_spec_sf_decode_consumes_reference_stream(name, tables):
    raw, gold = _pair(name)
    assert np.array_equal(rc.spec_decode_sf(gold, raw.shape[0], tables),
                          raw)


def test_device_single_lane_sf_bit_parity(tables):
    raw, gold = _pair("text")
    words, npos = rc.encode_lanes(raw[None, :], sf=tables)
    assert words[0, : int(npos[0])].astype("<u4").tobytes() == gold
    gw = np.frombuffer(gold + b"\0" * 8, "<u4")
    out = rc.decode_lanes(gw[None, :].copy(), raw.shape[0], sf=tables)
    assert np.array_equal(out[0], raw)
