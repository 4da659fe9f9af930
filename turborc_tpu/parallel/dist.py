"""Multi-host (multi-controller) distribution layer.

SURVEY.md section 2.7 P5: the reference has no communication backend at
all (single process, fread/fwrite).  The TPU framework's distribution
story is block data parallelism over a global (hosts x chips) mesh:

  * `initialize()` wraps jax.distributed.initialize (multi-controller).
  * `global_mesh()` builds a 1-D "data" mesh over ALL devices of the job
    (ICI within a host/slice, DCN across hosts - XLA routes the
    collectives).
  * `encode_blocks_dist` / `decode_blocks_dist` run the same shard_map
    codec SPMD on every process over process-local block shards
    (jax.make_array_from_process_local_data).
  * `collective_offsets` computes the container stitch offsets with a
    DEVICE-side exclusive cumsum over the sharded per-block lengths
    (all-gather + scan handled by GSPMD), replacing the round-1
    host-numpy stitch.

Every block stays independently decodable, so decode is embarrassingly
parallel given the offset table; no cross-block state crosses DCN.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Multi-controller init (idempotent).  With no arguments, reads the
    standard cluster env (JAX_COORDINATOR_ADDRESS etc.)."""
    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    # NOTE: must run before any backend-initialising jax call
    jax.distributed.initialize(**kwargs)
    initialize._done = True


def global_mesh() -> Mesh:
    """1-D data mesh over every device in the job (all processes)."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def _global_put(local: np.ndarray, mesh: Mesh) -> jax.Array:
    """Process-local [B_local, ...] shard -> global sharded array."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local)


def collective_offsets(lengths: jax.Array | np.ndarray,
                       mesh: Mesh) -> jax.Array:
    """Exclusive cumsum of per-(block, lane) u16 word counts in container
    order - the collective stitch.  lengths [B, L] sharded on B; the
    cumsum over the sharded axis lowers to an all-gather + scan on ICI
    (within slice) / DCN (across hosts).  The result is fully replicated
    so every process can frame its own container segments."""
    if isinstance(lengths, np.ndarray):
        lengths = _global_put(lengths, mesh)
    fn = jax.jit(lambda x: jnp.cumsum(x.reshape(-1)) - x.reshape(-1),
                 out_shardings=NamedSharding(mesh, P()))
    return fn(lengths)


def encode_blocks_dist(blocks_local: np.ndarray, K: int, encode_fn,
                       mesh: Mesh):
    """Encode process-local [B_local, L, K] blocks over the global mesh.

    Returns (streams global jax.Array [B, L, M], lengths [B, L],
    offsets [B*L]) - every process holds its addressable shards; the
    offset table is identical on all processes (fully replicated result
    of the collective stitch).
    """
    jb = _global_put(blocks_local.astype(np.int32), mesh)

    def per_shard(blk):
        return jax.vmap(lambda b: encode_fn(b, K))(blk)

    fn = jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    streams, lengths = fn(jb)
    offsets = collective_offsets(lengths, mesh)
    return streams, lengths, offsets


def decode_blocks_dist(streams: jax.Array, K: int, decode_fn, mesh: Mesh):
    """Decode the global sharded streams; returns the global decoded
    array (each process holds its own block shards)."""

    def per_shard(s):
        return jax.vmap(lambda x: decode_fn(x, K))(s)

    fn = jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    return fn(streams)


def local_shards(arr: jax.Array) -> np.ndarray:
    """Concatenate this process's addressable shards (block-major)."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
    return np.concatenate([np.asarray(s.data) for s in shards])
