"""Multi-host (multi-controller) layer test: 2 real processes over
jax.distributed on the CPU backend, 2 virtual devices each (global mesh
of 4), exercising the SPMD encode/decode shard_map and the collective
stitch offsets (parallel/dist.py)."""
import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
import numpy as np
import jax

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
# initialize BEFORE importing turborc_tpu (whose registry touches the
# backend to decide kernel-codec registration); CPU multi-process needs
# the gloo cross-process collectives client.  The harness env pins
# JAX_PLATFORMS=axon in a way the env var can't override - use the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
from turborc_tpu.parallel import dist
dist.initialize._done = True
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()

from turborc_tpu.codecs import rans_cdf_o0 as C
mesh = dist.global_mesh()
L, K, B_local = 16, 64, 2
rng = np.random.default_rng(100 + pid)  # different data per process
blocks = rng.integers(0, 64, size=(B_local, L, K)).astype(np.int32)

streams, lengths, offsets = dist.encode_blocks_dist(
    blocks, K, C.encode_device, mesh)
out = dist.decode_blocks_dist(streams, K, C.decode_device, mesh)
mine = dist.local_shards(out)
assert np.array_equal(mine, blocks), "local decode shard mismatch"

# the collective stitch offsets are replicated and globally consistent
offs = np.asarray(offsets)
lens = np.asarray(dist.local_shards(lengths)).reshape(-1)
B_total = nproc * B_local
assert offs.shape == (B_total * L,)
assert offs[0] == 0 and (np.diff(offs) >= 0).all()
# my shard's lengths appear at my offset positions
start = pid * B_local * L
np.testing.assert_array_equal(np.diff(offs)[start:start + len(lens) - 1],
                              lens[:-1])
print(f"proc {pid} ok")
"""


def test_two_process_distributed_roundtrip(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for i, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}\nSTDOUT:{so}\nSTDERR:{se}"
        assert f"proc {i} ok" in so
