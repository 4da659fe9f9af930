"""Rig profile: measure the raw host<->device link and the product
path's time split (VERDICT r03 missing #2: the 'tunnel-link-bound'
claim shipped without a committed link-bandwidth number).

Reference analog: the reference's CLI *is* its bench path
(turborc.c:420-579), so it has no link; this artifact documents why a
tunneled single-chip rig cannot match kernel-resident numbers and what
the product path's ceiling is.

Usage: python -m turborc_tpu.bench.rig_profile [out.json]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def main(out_path: str | None = None):
    dev = jax.devices()[0]
    res = {"device": str(dev), "rows": []}

    for mb in (1, 16, 64):
        n = mb << 20
        host = np.random.default_rng(0).integers(
            0, 256, n, dtype=np.uint8)
        # upload: host numpy -> device, block until committed
        darr = jax.device_put(host, dev)
        darr.block_until_ready()  # warm path / allocator

        def up():
            jax.device_put(host, dev).block_until_ready()

        t_up = _timed(up)

        # download: device -> host numpy.  np.asarray caches the host
        # copy on the array, so fetch DISTINCT fresh device buffers.
        g = jax.jit(lambda x, s: x ^ s)
        fresh = [g(darr, jnp.uint8(i + 1)) for i in range(3)]
        jax.block_until_ready(fresh)
        t_down = min(_timed(lambda a=a: np.asarray(a), reps=1)
                     for a in fresh)

        # device-resident elementwise touch of the same bytes, for scale
        f = jax.jit(lambda x: (x + jnp.uint8(1)) ^ jnp.uint8(3))
        f(darr).block_until_ready()
        t_dev = _timed(lambda: f(darr).block_until_ready())

        row = {"mb": mb,
               "upload_mbs": round(mb / t_up, 2),
               "download_mbs": round(mb / t_down, 2),
               "device_touch_mbs": round(mb / t_dev, 2)}
        res["rows"].append(row)
        print(json.dumps(row), flush=True)

    # host numpy memory bandwidth for scale (1-core rig)
    a = np.random.default_rng(1).integers(0, 256, 64 << 20, dtype=np.uint8)
    t_host = _timed(lambda: a.copy())
    res["host_memcpy_mbs"] = round(64 / t_host, 2)
    print(json.dumps({"host_memcpy_mbs": res["host_memcpy_mbs"]}),
          flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    return res


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
