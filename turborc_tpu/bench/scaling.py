"""Multi-device scaling-efficiency reporter (SURVEY.md section 5/7).

Block data parallelism over a jax Mesh is the framework's distribution
axis; this driver measures WEAK scaling: per-device block size held
constant, devices 1..N, aggregate encode+decode throughput per mesh
size.  Two efficiency bases are reported because they answer different
questions on different rigs:

- parallel_efficiency = dec_mbs / (base_dec_mbs * ndev): the real
  multi-chip metric (ideal = linear aggregate throughput).  Meaningful
  ONLY when devices are physically parallel.
- overhead_efficiency = dec_mbs / base_dec_mbs: on a VIRTUAL mesh
  (XLA_FLAGS=--xla_force_host_platform_device_count=N on one socket)
  every "device" timeshares the same core, so the ideal aggregate
  throughput is FLAT; any drop below 1.0 is the cost the sharded
  program added (collectives, stitch, scheduling).  This is the metric
  a 1-core virtual rig can honestly measure, and it bounds the real
  multi-chip efficiency from the software side.

Usage: python -m turborc_tpu.bench.scaling [per_device_mb] [max_devices]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(per_mb: float = 4, max_devices: int | None = None,
            lanes: int = 256, reps: int = 2) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from turborc_tpu.bench import corpus
    from turborc_tpu.codecs import rans_cdf_o0 as C
    from turborc_tpu.parallel import mesh as pmesh

    ndev_all = len(jax.devices())
    max_devices = min(max_devices or ndev_all, ndev_all)
    per = int(per_mb * (1 << 20))
    data = corpus.get("textbwt", per * max_devices)

    results = []
    base = None
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= max_devices]
    for ndev in counts:
        mesh = pmesh.make_mesh(ndev)
        B = ndev  # one block per device, constant per-device bytes
        n_used = per * B
        blocks = np.stack([
            C._shape_block(data[i * per:(i + 1) * per], lanes, 256)[0]
            for i in range(B)])
        K = blocks.shape[2]

        # timing methodology (see bench.py / cli.py): the backend caches
        # identical executions, so (a) warm up each mesh size before the
        # timed region (JIT compile excluded), (b) give every timed rep a
        # distinct pre-staged input, (c) sync via a device->host transfer.
        variants = [jnp.asarray((blocks + r) % 256) for r in range(reps)]
        streams, lengths = pmesh.encode_blocks(variants[0], K,
                                               C.encode_device, mesh)
        np.asarray(lengths)[:1]  # sync warm-up
        t0 = time.perf_counter()
        for r in range(reps):
            s_r, l_r = pmesh.encode_blocks(variants[r], K, C.encode_device,
                                           mesh)
            np.asarray(l_r)[:1]
        enc_s = (time.perf_counter() - t0) / reps
        enc_streams = [pmesh.encode_blocks(v, K, C.encode_device, mesh)[0]
                       for v in variants]
        out = pmesh.decode_blocks(enc_streams[0], K, C.decode_device, mesh)
        np.asarray(out)[:1, :1, :1]  # sync warm-up
        t0 = time.perf_counter()
        for r in range(reps):
            out = pmesh.decode_blocks(enc_streams[r], K, C.decode_device,
                                      mesh)
            np.asarray(out)[:1, :1, :1]
        dec_s = (time.perf_counter() - t0) / reps
        ok = bool(np.array_equal(np.asarray(out),
                                 np.asarray(variants[reps - 1])))

        dec_mbs = n_used / dec_s / 1e6
        if base is None:
            base = dec_mbs
        results.append(dict(
            devices=ndev, per_device_mb=round(per / 1e6, 2),
            decode_mbs=round(dec_mbs, 3),
            encode_mbs=round(n_used / enc_s / 1e6, 3),
            parallel_efficiency=round(dec_mbs / (base * ndev), 3),
            overhead_efficiency=round(dec_mbs / base, 3),
            roundtrip_ok=ok,
        ))
    return results


def main():
    per_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4
    max_devices = int(sys.argv[2]) if len(sys.argv) > 2 else None
    for row in measure(per_mb, max_devices):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
