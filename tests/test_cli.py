"""CLI harness: bench sweep (min-of-runs timing, JSON dump, profiler
trace hook), compress/decompress round-trip, codec listing."""
import json
import os

import numpy as np
import pytest

from turborc_tpu import cli


@pytest.fixture()
def sample_file(tmp_path, rng):
    p = tmp_path / "data.bin"
    ranks = np.argsort(rng.random(256))
    q = 1.0 / np.arange(1, 257) ** 1.2
    ranks[rng.choice(256, 20000, p=q / q.sum())].astype(np.uint8).tofile(p)
    return p


def test_bench_json_and_profile(tmp_path, sample_file, capsys):
    out_json = tmp_path / "bench.json"
    prof_dir = tmp_path / "trace"
    cli.main(["bench", str(sample_file), "-i", "rans-static",
              "-r", "2", "--json", str(out_json),
              "--profile", str(prof_dir)])
    rep = json.loads(out_json.read_text())
    row = rep["rows"][0]
    assert row["roundtrip_ok"] and row["codec"] == "rans-static"
    # min-of-runs: the min-based figure can't be slower than the mean
    assert row["enc_mbs"] >= row["enc_mbs_mean"]
    assert row["dec_mbs"] >= row["dec_mbs_mean"]
    # the jax.profiler trace hook must produce trace artifacts
    found = [f for _, _, fs in os.walk(prof_dir) for f in fs]
    assert found, "profiler trace dir is empty"
    assert "Best methods" in capsys.readouterr().out


def test_compress_decompress_files(tmp_path, sample_file, capsys):
    blob = tmp_path / "out.trct"
    back = tmp_path / "back.bin"
    cli.main(["c", str(sample_file), str(blob), "-c", "rans-static"])
    cli.main(["d", str(blob), str(back)])
    assert back.read_bytes() == sample_file.read_bytes()


def test_ls(capsys):
    cli.main(["ls"])
    out = capsys.readouterr().out
    # rc-p / rans-cdf-o0-p are TPU-only registrations (Mosaic kernels)
    for name in ("rans-cdf-o0", "rc-o0", "rcbwt", "rans-cdf-s8"):
        assert name in out
