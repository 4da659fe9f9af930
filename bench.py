#!/usr/bin/env python
"""Driver benchmark: flagship codec on the deterministic BWT-text corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric: single-chip DECODE throughput of the flagship adaptive-CDF rANS
codec (reference counterpart: `turborc -e56`, 202.27 MB/s decode on
enwik8bwt per BASELINE.md).  Extras report encode MB/s and compression
ratio on the same corpus.
"""
import json
import time

import numpy as np

BASELINE_DEC_MBS = 202.27  # reference ans auto decode, BASELINE.md id 56
BASELINE_ENC_MBS = 116.76
BASELINE_RATIO = 0.2485    # on enwik8bwt (corpus differs; informational)

CORPUS_MB = 16
LANES = 1024
STEP_QUANT = 256


def main():
    import jax
    import jax.numpy as jnp
    from turborc_tpu.bench import corpus
    from turborc_tpu.codecs import rans_cdf_o0 as C

    n = CORPUS_MB << 20
    data = corpus.get("textbwt", n)

    block, K = C._shape_block(data, LANES, STEP_QUANT)
    jb = jax.device_put(jnp.asarray(block))

    # warm up / compile
    streams, lengths = C.encode_device(jb, K)
    jax.block_until_ready((streams, lengths))
    out = C.decode_device(streams, K)
    out.block_until_ready()
    ok = bool(np.array_equal(np.asarray(out), block))

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        s, l = C.encode_device(jb, K)
        jax.block_until_ready((s, l))
    enc_s = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        out = C.decode_device(streams, K)
        out.block_until_ready()
    dec_s = (time.perf_counter() - t0) / reps

    comp_bytes = int(np.asarray(lengths).sum()) * 2 + 2 * LANES
    dec_mbs = n / dec_s / 1e6
    enc_mbs = n / enc_s / 1e6
    print(json.dumps({
        "metric": "rans-cdf-o0 decode MB/s (1 chip, 16MB bwt-text)",
        "value": round(dec_mbs, 2),
        "unit": "MB/s",
        "vs_baseline": round(dec_mbs / BASELINE_DEC_MBS, 4),
        "encode_mbs": round(enc_mbs, 2),
        "encode_vs_baseline": round(enc_mbs / BASELINE_ENC_MBS, 4),
        "ratio": round(comp_bytes / n, 4),
        "roundtrip_ok": ok,
        "lanes": LANES,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
