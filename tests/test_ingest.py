"""Text/CSV/timestamp ingest (reference befgen role)."""
import numpy as np

from turborc_tpu.utils import ingest


def test_numbers_first_column():
    text = b"17 foo\n-3,99\n42.5\n"
    vals = ingest.parse_first_column(text)
    np.testing.assert_array_equal(vals, [17, -3, 42])  # 42.5 rounds to even


def test_csv_all_fields_scaled():
    text = b"1.5,2.5;3\n4\t5\n"
    vals = ingest.parse_numbers(text, scale=10)
    np.testing.assert_array_equal(vals, [15, 25, 30, 40, 50])


def test_timestamps_dates():
    text = b"1970-01-01\n1970-01-02 00:00:01\n2024-03-01 12:00:00\n"
    vals = ingest.parse_timestamps(text)
    assert vals[0] == 0
    assert vals[1] == 86401
    # cross-check with numpy datetime
    expect = np.datetime64("2024-03-01T12:00:00") - \
        np.datetime64("1970-01-01T00:00:00")
    assert vals[2] == expect.astype("timedelta64[s]").astype(np.int64)


def test_timestamps_times_ms():
    vals = ingest.parse_timestamps(b"00:00:01.5\n01:00:00\n")
    np.testing.assert_array_equal(vals, [1500, 3600000])


def test_fixed_width_wraps_negative():
    out = ingest.to_fixed_width(np.array([-1, 256], np.int64), 2)
    np.testing.assert_array_equal(out, [0xFF, 0xFF, 0x00, 0x01])


def test_ingest_feeds_codec(rng):
    from turborc_tpu import CodecConfig, compress, decompress
    lines = b"\n".join(b"%d" % v for v in
                       np.cumsum(rng.integers(0, 50, 500)))
    data = ingest.ingest(lines, fmt="num", esize=4)
    cfg = CodecConfig(codec="rans-v32z", lanes=8, block_size=1 << 14,
                      step_quant=64)
    blob = compress(data, cfg)
    assert decompress(blob) == data.tobytes()
