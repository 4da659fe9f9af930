#!/usr/bin/env python
"""Driver benchmark: flagship codec on the deterministic BWT-text corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric: single-chip DECODE throughput of the flagship adaptive-CDF rANS
codec (reference counterpart: `turborc -e56`).  vs_baseline uses the
reference README number (202.27 MB/s on enwik8bwt, BASELINE.md id 56);
vs_ref_same_machine uses the reference binary built and measured on THIS
machine on THIS corpus (bench/_baseline/ref_textbwt64.json, via
turborc_tpu/bench/baseline_ref.py).  Ratio is the real container payload
(share-8 span models + per-group packed warm tables + remap, format v2)
against the same file the reference binary was run on.

Methodology notes: the tunneled device backend caches identical
executions and its block_until_ready does not reliably block, so every
timed repetition uses a DISTINCT pre-staged input and synchronizes via a
small device->host transfer.
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax-turborc"))

BASELINE_DEC_MBS = 202.27  # reference ans auto decode, BASELINE.md id 56
BASELINE_ENC_MBS = 116.76
BASELINE_RATIO = 0.2485    # on enwik8bwt (corpus differs; informational)

CORPUS_MB = 64
REPS = 3

# Flagship geometry for the headline row (overridable via TRC_GEOM spec).
# Round-3 pick from the measured frontier (geom_sweep + ratio_probe on
# the TPU): y8 + arows=4 decodes at 964 MB/s kernel with the SAME
# product payload as arows=16 (0.27425 on 64MB textbwt) because the
# frequency-rank remap keeps the hi-nibble mass in rows 0-3.
GEOM_SPEC = os.environ.get("TRC_GEOM", "g64c8s8y8l32a4r4")


def _same_machine_baseline():
    """Reference-binary numbers measured on this machine/corpus (id 56)."""
    import pathlib
    p = (pathlib.Path(__file__).parent / "turborc_tpu" / "bench"
         / "_baseline" / "ref_textbwt64.json")
    try:
        rows = json.loads(p.read_text())["rows"]
        return next(r for r in rows if r["id"] == 56)
    except Exception:
        return None


def _bench_pallas(data, n):
    """Pallas-kernel codec on the real TPU chip (format v3)."""
    import jax.numpy as jnp
    from turborc_tpu.codecs import blockio as bio
    from turborc_tpu.codecs import rans_pallas as P
    from turborc_tpu.ops.pallas import rans_kernel as K_
    from turborc_tpu.ops.pallas.geom import Geom

    g = Geom.parse(GEOM_SPEC)
    K = P._K_for(n, g)
    blocks, his, los = [], [], []
    for i in range(REPS + 1):
        d = ((data.astype(np.int32) + i) % 256).astype(np.uint8)
        block, padded = P._shape_lanes(d, K, g)
        _, (hq, lq) = bio.quantize_tables(*P._group_tables(padded, g))
        hi_tbl, lo_tbl = P._cum_args(hq, lq)
        blocks.append(jnp.asarray(block))
        his.append(hi_tbl)
        los.append(lo_tbl)
    _ = [np.asarray(b[0, :4]) for b in blocks]  # force upload

    dec_tile = K_.decode_tile_x2 if g.nstates == 2 else K_.decode_tile
    gs0, gl0 = K_.encode_tile_pallas(blocks[0], K, his[0], los[0], geom=g)
    _ = np.asarray(gl0)  # warm compile + sync
    t0 = time.perf_counter()
    outs = [K_.encode_tile_pallas(blocks[i], K, his[i], los[i], geom=g)
            for i in range(1, REPS + 1)]
    _ = [np.asarray(o[1]) for o in outs]  # sync
    enc_s = (time.perf_counter() - t0) / REPS

    streams = [gs0] + [o[0] for o in outs]
    out, _fs = dec_tile(streams[0], K, his[0], los[0], geom=g)
    _ = np.asarray(out[0, 0, :4])
    t0 = time.perf_counter()
    decs = [dec_tile(streams[i], K, his[i], los[i], geom=g)
            for i in range(1, REPS + 1)]
    _ = [np.asarray(d[0][0, 0, :4]) for d in decs]  # sync
    dec_s = (time.perf_counter() - t0) / REPS

    ok = bool(np.array_equal(
        np.asarray(out).reshape(K, g.lanes).T, np.asarray(blocks[0])))
    # true container payload (remap + packed tables + streams)
    payload = P.encode_block(data, geom=g)
    ok = ok and bool(np.array_equal(
        P.decode_block(payload, n, geom=g), data))
    return enc_s, dec_s, len(payload), ok, g.lanes


def _bench_xla(data, n):
    """Pure-XLA codec fallback (CPU or kernel-less platforms)."""
    import jax.numpy as jnp
    from turborc_tpu.codecs import rans_cdf_o0 as C

    lanes, step = 1024, 256
    block, K = C._shape_block(data, lanes, step)
    blocks = [jnp.asarray((block + i) % 256) for i in range(REPS + 1)]
    _ = [np.asarray(b[0, :4]) for b in blocks]

    s0, l0 = C.encode_device(blocks[0], K)
    _ = np.asarray(l0)
    t0 = time.perf_counter()
    outs = [C.encode_device(blocks[i], K) for i in range(1, REPS + 1)]
    _ = [np.asarray(o[1]) for o in outs]
    enc_s = (time.perf_counter() - t0) / REPS

    streams = [s0] + [o[0] for o in outs]
    out = C.decode_device(streams[0], K)
    _ = np.asarray(out[0, :4])
    t0 = time.perf_counter()
    decs = [C.decode_device(streams[i], K) for i in range(1, REPS + 1)]
    _ = [np.asarray(d[0, :4]) for d in decs]
    dec_s = (time.perf_counter() - t0) / REPS

    ok = bool(np.array_equal(np.asarray(out), block))
    comp_bytes = int(np.asarray(l0).sum()) * 2 + 2 * lanes
    return enc_s, dec_s, comp_bytes, ok, lanes


def main():
    import jax
    from turborc_tpu.bench import corpus

    n = CORPUS_MB << 20
    data = corpus.get("textbwt", n)

    on_tpu = jax.default_backend() not in ("cpu",)
    bench = _bench_pallas if on_tpu else _bench_xla
    enc_s, dec_s, comp_bytes, ok, lanes = bench(data, n)

    dec_mbs = n / dec_s / 1e6
    enc_mbs = n / enc_s / 1e6
    ref = _same_machine_baseline()
    extras = {}
    if ref:
        extras = {
            "vs_ref_same_machine": round(dec_mbs / ref["dec_mbs"], 4),
            "ref_same_machine_dec_mbs": ref["dec_mbs"],
            "ref_same_machine_ratio": ref["ratio"],
            "ratio_vs_ref_same_corpus": round(
                (comp_bytes / n) / ref["ratio"], 4),
        }
    print(json.dumps({
        "metric": f"flagship rans-cdf decode MB/s (1 chip, "
                  f"{CORPUS_MB}MB bwt-text)",
        "value": round(dec_mbs, 2),
        "unit": "MB/s",
        "vs_baseline": round(dec_mbs / BASELINE_DEC_MBS, 4),
        "encode_mbs": round(enc_mbs, 2),
        "encode_vs_baseline": round(enc_mbs / BASELINE_ENC_MBS, 4),
        "ratio": round(comp_bytes / n, 5),
        "roundtrip_ok": ok,
        "lanes": lanes,
        "geom": GEOM_SPEC if on_tpu else None,
        "kernel": "pallas" if on_tpu else "xla",
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
