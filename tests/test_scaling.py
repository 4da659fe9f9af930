"""Scaling-efficiency reporter runs on the virtual CPU mesh."""


def test_scaling_reporter_runs():
    from turborc_tpu.bench import scaling
    rows = scaling.measure(per_mb=1 / 32, max_devices=2, lanes=8, reps=1)
    assert [r["devices"] for r in rows] == [1, 2]
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["decode_mbs"] > 0 for r in rows)
    assert rows[0]["parallel_efficiency"] == 1.0
    assert rows[0]["overhead_efficiency"] == 1.0
