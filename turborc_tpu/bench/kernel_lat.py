"""Decode/encode kernel timing at the current TRC_* geometry.

Times ONLY the Pallas kernels (inputs pre-staged on device, sync via a
small device->host transfer), so geometry sweeps attribute time to kernel
ops, not the host<->device link.  Usage:

    TRC_SHARE=8 TRC_SYNC=4 python -m turborc_tpu.bench.kernel_lat [MB]
    python -m turborc_tpu.bench.kernel_lat [MB] o1    # order-1 kernels

Prints one JSON line with enc/dec MB/s for the flagship kernels.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax-turborc"))


def main():
    import jax.numpy as jnp

    from turborc_tpu.bench import corpus
    from turborc_tpu.codecs import blockio as bio
    from turborc_tpu.codecs import rans_pallas as P
    from turborc_tpu.ops.pallas import rans_kernel as K_

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    o1 = "o1" in sys.argv[2:]
    reps = int(os.environ.get("TRC_REPS", "3"))
    n = mb << 20
    data = corpus.get("textbwt", n)

    if o1:
        from turborc_tpu.codecs import rans_cdf_r1 as R1
        from turborc_tpu.codecs import rans_pallas_r1 as P1
        from turborc_tpu.ops.pallas import rans_o1_kernel as K_
        K = P1._K_for(n)
    else:
        K = P._K_for(n)

    blocks, his, los = [], [], []
    for i in range(reps + 1):
        d = ((data.astype(np.int32) + i) % 256).astype(np.uint8)
        if o1:
            padded = np.zeros(P.LANES * K, np.uint8)
            padded[:n] = d
            block = padded.reshape(P.LANES, K)
            G_eff = R1.n_segments(n, P.GROUPS)
            _, (hq, lq) = R1.quantize_tables(*R1.group_tables(padded,
                                                              G_eff))
            seg = (np.arange(P.GROUPS, dtype=np.int64) * G_eff) // P.GROUPS
            hi_tbl, lo_tbl = P1._cum_args(hq[seg], lq[seg])
        else:
            block, padded = P._shape_lanes(d, K)
            _, (hq, lq) = bio.quantize_tables(*P._group_tables(padded))
            hi_tbl, lo_tbl = P._cum_args(hq, lq)
        blocks.append(jnp.asarray(block))
        his.append(hi_tbl)
        los.append(lo_tbl)
    _ = [np.asarray(b[0, :4]) for b in blocks]

    gs0, gl0 = K_.encode_tile_pallas(blocks[0], K, his[0], los[0])
    _ = np.asarray(gl0)
    t0 = time.perf_counter()
    outs = [K_.encode_tile_pallas(blocks[i], K, his[i], los[i])
            for i in range(1, reps + 1)]
    _ = [np.asarray(o[1]) for o in outs]
    enc_s = (time.perf_counter() - t0) / reps

    streams = [gs0] + [o[0] for o in outs]
    out, _fs = K_.decode_tile(streams[0], K, his[0], los[0])
    _ = np.asarray(out[0, 0, :4])
    t0 = time.perf_counter()
    decs = [K_.decode_tile(streams[i], K, his[i], los[i])
            for i in range(1, reps + 1)]
    _ = [np.asarray(d[0][0, 0, :4]) for d in decs]
    dec_s = (time.perf_counter() - t0) / reps

    ok = bool(np.array_equal(
        np.asarray(out).reshape(K, P.LANES).T, np.asarray(blocks[0])))
    print(json.dumps({
        "kernel": "o1" if o1 else "o0",
        "groups": K_.GROUPS, "chunk": K_.CHUNK,
        "share": 1 if o1 else K_.SHARE,
        "sync": 0 if o1 else K_.SYNC,
        "lsync": 0 if o1 else getattr(K_, "LSYNC", K_.SYNC),
        "mb": mb,
        "enc_mbs": round(n / enc_s / 1e6, 1),
        "dec_mbs": round(n / dec_s / 1e6, 1),
        "roundtrip_ok": ok,
    }))


if __name__ == "__main__":
    main()
