"""Single-process flagship geometry sweep on the real TPU.

Round 3: geometry is a runtime argument (ops/pallas/geom.py), so one
process can sweep kernel geometries back-to-back with the corpus staged
once - no env-respawn per point, and the jit cache persists across
points that share shapes.  Prints one JSON line per geometry with
kernel-only encode/decode MB/s and the payload ratio estimated from the
group stream lengths (stream words + state rows + warm tables + length
table + remap).

Usage:
    python -m turborc_tpu.bench.geom_sweep [MB] [g64c8s8y4l32a16 ...]

Geometry spec: g<groups>c<chunk>s<share>y<sync>l<lsync>a<arows>.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax-turborc"))

DEFAULT_POINTS = [
    "g64c8s8y4l32a16",    # round-2 shipped default
    "g64c8s8y8l32a16",    # faster sync cadence point
    "g64c8s8y8l32a4",     # static cold rows (smaller scratch, fewer wb)
    "g128c8s8y8l32a4",    # wider tile at the shrunk scratch
    "g128c8s8y4l32a4",
    "g128c8s8y8l32a16",   # wider tile, full adaptive rows (VMEM risk)
]


def parse_geom(spec: str):
    from turborc_tpu.ops.pallas.geom import Geom
    return Geom.parse(spec)


def run_point(data: np.ndarray, geom, reps: int) -> dict:
    import jax.numpy as jnp

    from turborc_tpu.codecs import blockio as bio
    from turborc_tpu.codecs import rans_pallas as P
    from turborc_tpu.ops.pallas import rans_kernel as K_

    n = data.shape[0]
    K = P._K_for(n, geom)
    blocks, his, los = [], [], []
    for i in range(reps + 1):
        d = ((data.astype(np.int32) + i) % 256).astype(np.uint8)
        block, padded = P._shape_lanes(d, K, geom)
        _, (hq, lq) = bio.quantize_tables(*P._group_tables(padded, geom))
        hi_tbl, lo_tbl = P._cum_args(hq, lq)
        blocks.append(jnp.asarray(block))
        his.append(hi_tbl)
        los.append(lo_tbl)
    _ = [np.asarray(b[0, :4]) for b in blocks]

    gs0, gl0 = K_.encode_tile_pallas(blocks[0], K, his[0], los[0],
                                     geom=geom)
    _ = np.asarray(gl0)
    t0 = time.perf_counter()
    outs = [K_.encode_tile_pallas(blocks[i], K, his[i], los[i], geom=geom)
            for i in range(1, reps + 1)]
    _ = [np.asarray(o[1]) for o in outs]
    enc_s = (time.perf_counter() - t0) / reps

    streams = [gs0] + [o[0] for o in outs]
    out, _fs = K_.decode_tile(streams[0], K, his[0], los[0], geom=geom)
    _ = np.asarray(out[0, 0, :4])
    t0 = time.perf_counter()
    decs = [K_.decode_tile(streams[i], K, his[i], los[i], geom=geom)
            for i in range(1, reps + 1)]
    _ = [np.asarray(d[0][0, 0, :4]) for d in decs]
    dec_s = (time.perf_counter() - t0) / reps

    ok = bool(np.array_equal(
        np.asarray(out).reshape(K, geom.lanes).T, np.asarray(blocks[0])))
    # ratio estimate: stream words (u16) + warm-table codes (packed ~40%
    # of raw per round-2 measurements; use exact packed size) + lengths
    glens = np.asarray(gl0).astype(np.int64)
    codes, _ = bio.quantize_tables(*P._group_tables(
        P._shape_lanes(data, K, geom)[1], geom))
    wire = (256 + len(bio.pack_codes(codes)) + 4 * geom.groups
            + 2 * int(glens.sum()))
    return {
        "geom": f"g{geom.groups}c{geom.chunk}s{geom.share}"
                f"y{geom.sync}l{geom.lsync}a{geom.arows}r{geom.srows}",
        "mb": n >> 20,
        "enc_mbs": round(n / enc_s / 1e6, 1),
        "dec_mbs": round(n / dec_s / 1e6, 1),
        "ratio": round(wire / n, 5),
        "roundtrip_ok": ok,
    }


def main():
    from turborc_tpu.bench import corpus

    args = sys.argv[1:]
    mb = int(args.pop(0)) if args and args[0].isdigit() else 64
    specs = args or DEFAULT_POINTS
    reps = int(os.environ.get("TRC_REPS", "2"))
    data = corpus.get("textbwt", mb << 20)
    for spec in specs:
        geom = parse_geom(spec)
        try:
            r = run_point(data, geom, reps)
        except Exception as e:  # VMEM overflow etc: record and continue
            r = {"geom": spec, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
