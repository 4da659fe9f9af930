"""Device mesh + data-parallel block sharding.

The reference is single-process/single-threaded (SURVEY.md section 2.7);
its only parallelism axes are interleaved coder states (P1) and block
segmentation (P3).  The TPU framework promotes both:

- P1 -> lanes (vectorized within a chip, see ops/rans.py)
- P3 -> blocks sharded over the "data" axis of a jax Mesh via shard_map.
  Blocks are independently decodable (per-block model reset), so block DP
  is embarrassingly parallel; the only collectives are the all-gather of
  per-lane stream lengths for container stitching.

TP/PP/EP/CP have no analog in an entropy codec and are intentionally N/A:
"sequence scaling" (arbitrarily large files) is carried entirely by block
DP across chips/hosts plus lane interleaving within a chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


@functools.partial(jax.jit, static_argnames=("K", "encode_fn", "decode_fn",
                                              "mesh"))
def _roundtrip_sharded(blocks: jnp.ndarray, K: int, encode_fn, decode_fn,
                       mesh: Mesh):
    """Encode+decode B blocks sharded over the data axis; returns
    (decoded blocks, per-block compressed word counts)."""

    def per_shard(blk):
        # blk [b_local, L, K]
        streams, lengths = jax.vmap(lambda b: encode_fn(b, K))(blk)
        out = jax.vmap(lambda s: decode_fn(s, K))(streams)
        return out, jnp.sum(lengths, axis=-1)

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=P("data"), out_specs=(P("data"), P("data")),
        check_vma=False)
    return shard(blocks)


def encode_blocks(blocks: np.ndarray, K: int, encode_fn, mesh: Mesh):
    """Encode [B, L, K] blocks data-parallel over the mesh.

    Returns (streams [B, L, M], lengths [B, L]) gathered to host.
    """
    B = blocks.shape[0]
    n = mesh.devices.size
    pad = (-B) % n
    if pad:
        blocks = np.concatenate([blocks, np.zeros_like(blocks[:pad])])
    sharding = NamedSharding(mesh, P("data"))
    jb = jax.device_put(jnp.asarray(blocks), sharding)

    def per_shard(blk):
        return jax.vmap(lambda b: encode_fn(b, K))(blk)

    fn = jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    streams, lengths = fn(jb)
    return np.asarray(streams)[:B], np.asarray(lengths)[:B]


def decode_blocks(streams: np.ndarray, K: int, decode_fn, mesh: Mesh):
    """Decode [B, L, M] compressed blocks data-parallel over the mesh."""
    B = streams.shape[0]
    n = mesh.devices.size
    pad = (-B) % n
    if pad:
        # padding streams must be VALID lane streams; an all-zero stream has
        # state 0 < ANS_LOW which would read out of bounds, so replicate
        # block 0 instead and drop it after.
        streams = np.concatenate([streams] + [streams[:1]] * pad)
    sharding = NamedSharding(mesh, P("data"))
    js = jax.device_put(jnp.asarray(streams), sharding)

    def per_shard(s):
        return jax.vmap(lambda x: decode_fn(x, K))(s)

    fn = jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False))
    return np.asarray(fn(js))[:B]
