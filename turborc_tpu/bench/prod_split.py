"""Product-path time split + overlap experiment (VERDICT r04 item 2).

Measures, for the flagship codec on 64MB text-bwt:
  (a) the decode path's serial time split: host unpack / upload /
      kernel / download / host post,
  (b) whether the tunnel link overlaps upload(i+1) with download(i)
      when blocks are dispatched ahead (JAX async dispatch),
  (c) the blocked product path (8MB blocks) sequential vs pipelined.

Usage: python -m turborc_tpu.bench.prod_split [out.json]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

DATA = "turborc_tpu/bench/_data/textbwt_67108864.bin"


def main(out_path=None):
    from turborc_tpu.codecs import rans_pallas as RP
    from turborc_tpu.ops.pallas import rans_kernel as K_
    from turborc_tpu.ops.pallas.geom import DEFAULT

    res = {"device": str(jax.devices()[0]), "geom": DEFAULT.spec}
    data = np.fromfile(DATA, np.uint8)
    n = data.shape[0]

    # ---- encode once (warm) to get a payload
    t = time.perf_counter()
    payload = RP.encode_block(data)
    t_enc_cold = time.perf_counter() - t
    t = time.perf_counter()
    payload = RP.encode_block(data)
    t_enc = time.perf_counter() - t
    res["enc_mbs_64m_block"] = round(n / t_enc / 1e6, 2)
    print(f"enc cold {t_enc_cold:.2f}s warm {t_enc:.2f}s "
          f"({n/t_enc/1e6:.1f} MB/s), payload {len(payload)}", flush=True)

    # ---- serial decode time split (instrumented copy of decode_block)
    g = DEFAULT
    s_len = min(n, RP._seed_bytes(g))
    K = RP._K_for(n - s_len, g)
    for rep in range(2):
        split = {}
        t0 = time.perf_counter()
        perm = np.frombuffer(payload[:256], np.uint8)
        codes, consumed = RP._bio.unpack_codes(payload[256:], g.groups)
        hi_q, lo_q = RP._bio.codes_to_tables(codes)
        off = 256 + consumed
        glens = np.frombuffer(payload[off:off + 4 * g.groups],
                              "<u4").astype(np.int64)
        flat = np.frombuffer(payload[off + 4 * g.groups:len(payload) & ~1],
                             "<u2")
        R = 2 * K + 2 + g.wrows
        Rn = RP._round_rows(-(-int(glens.max()) // 128) + g.wrows, R)
        gstreams = np.zeros((g.groups, Rn * 128), np.uint16)
        o = 0
        for gi in range(g.groups):
            ln = int(glens[gi])
            gstreams[gi, :ln] = flat[o:o + ln]
            o += ln
        hi_tbl, lo_tbl = RP._cum_args(hi_q, lo_q)
        split["host_unpack_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        up = jnp.asarray(gstreams.reshape(g.groups, Rn, 128))
        up.block_until_ready()
        split["upload_s"] = time.perf_counter() - t0
        split["upload_bytes"] = int(gstreams.nbytes)

        t0 = time.perf_counter()
        dev = RP._pad_rows(up, R)
        out, fstates = K_.decode_tile(dev, K, hi_tbl, lo_tbl, geom=g)
        S = g.lanes // g.share
        post = RP._post_decode(out, jnp.asarray(perm), K, S, g.share)
        post.block_until_ready()
        split["kernel_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        flat_bytes = np.asarray(post)
        split["download_s"] = time.perf_counter() - t0
        split["download_bytes"] = int(flat_bytes.nbytes)

        t0 = time.perf_counter()
        seed_bytes = RP._join_seed(np.asarray(fstates), s_len)
        outb = np.concatenate([perm[seed_bytes], flat_bytes[:n - s_len]])
        split["host_post_s"] = time.perf_counter() - t0
        total = sum(v for k, v in split.items() if k.endswith("_s"))
        split["total_s"] = round(total, 3)
        split["dec_mbs"] = round(n / total / 1e6, 2)
        split = {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in split.items()}
        if rep:
            res["decode_split_64m"] = split
        print("split", json.dumps(split), flush=True)
    assert bytes(outb) == bytes(data)

    # ---- duplex probe: is upload(i+1) overlapped with download(i)?
    a16 = np.random.default_rng(0).integers(0, 256, 16 << 20,
                                            dtype=np.uint8)
    f = jax.jit(lambda x: x ^ jnp.uint8(1))
    d0 = f(jax.device_put(a16)); d0.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(d0)
    t_down = time.perf_counter() - t0
    d0 = f(jax.device_put(a16)); d0.block_until_ready()
    t0 = time.perf_counter()
    up1 = jax.device_put(a16)          # async upload dispatch
    np.asarray(d0)                     # download while upload in flight
    up1.block_until_ready()
    t_both = time.perf_counter() - t0
    t0 = time.perf_counter()
    up2 = jax.device_put(a16); up2.block_until_ready()
    t_up = time.perf_counter() - t0
    res["duplex_probe"] = {
        "up16_s": round(t_up, 3), "down16_s": round(t_down, 3),
        "overlapped_s": round(t_both, 3),
        "duplex_gain": round((t_up + t_down) / t_both, 3)}
    print("duplex", json.dumps(res["duplex_probe"]), flush=True)

    if out_path:
        with open(out_path, "w") as fo:
            json.dump(res, fo, indent=1)
    return res


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
