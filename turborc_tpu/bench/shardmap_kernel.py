"""shard_map-wrapped flagship KERNEL round-trip on the real chip.

VERDICT r04 weak #6: the Pallas kernel codecs had no coverage inside the
distribution layer (dryrun/multihost tests necessarily exercise the XLA
twins on CPU).  This drives decode_tile through jax.shard_map over the
real device mesh (1 chip on this rig; the same program shards over N on
a pod - the mesh axis is the block axis) and verifies bytes.

Run on TPU: python -m turborc_tpu.bench.shardmap_kernel
Writes SHARDMAP_KERNEL_r05.json to the repo root.
"""
from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from turborc_tpu.bench import corpus
from turborc_tpu.codecs import blockio as bio
from turborc_tpu.codecs import rans_pallas as RP
from turborc_tpu.ops.pallas import rans_kernel as K_
from turborc_tpu.ops.pallas.geom import Geom


def main():
    g = Geom.parse("g64c8s8y8l32a4r4")  # headline bench geometry
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))
    D = devs.size
    n = 4 << 20
    data = corpus.get("textbwt", n * D)

    # one flagship tile per device: stack the per-block kernel args
    Kk = RP._K_for(n, g)
    blocks, his, los = [], [], []
    for d in range(D):
        blk, padded = RP._shape_lanes(data[d * n:(d + 1) * n], Kk, g)
        _, (hq, lq) = bio.quantize_tables(*RP._group_tables(padded, g))
        hi, lo = RP._cum_args(hq, lq)
        blocks.append(blk)
        his.append(np.asarray(hi))
        los.append(np.asarray(lo))
    blocks = jnp.asarray(np.stack(blocks))
    his = jnp.asarray(np.stack(his))
    los = jnp.asarray(np.stack(los))

    # encode per block OUTSIDE the mesh (the XLA encode twin's scan
    # carries hit a shard_map varying-axis typing restriction; encode is
    # embarrassingly parallel over blocks anyway), then shard_map the
    # flagship DECODE KERNEL over the device mesh - the path the
    # distribution layer actually runs hot.
    streams = []
    R = None
    for d in range(D):
        gs, _gl = K_.encode_tile_pallas(blocks[d], Kk, his[d], los[d],
                                        geom=g)
        streams.append(np.asarray(gs))
        R = gs.shape[1]
    streams = jnp.asarray(np.stack(streams))

    def per_shard(st, hi, lo):
        out, _fs = K_.decode_tile(st[0], Kk, hi[0], lo[0], geom=g)
        return out[None]

    # check_vma=False: pallas_call's out_shape carries no varying-axis
    # metadata, which strict shard_map vma checking rejects
    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    out = np.asarray(fn(streams, his, los))
    ok = all(np.array_equal(out[d].reshape(Kk, g.lanes).T,
                            np.asarray(blocks[d])) for d in range(D))
    row = {"devices": int(D), "geom": g.spec, "block_mb": n >> 20,
           "roundtrip_ok": bool(ok),
           "device": str(jax.devices()[0])}
    print(json.dumps(row))
    (pathlib.Path(__file__).resolve().parents[2]
     / "SHARDMAP_KERNEL_r05.json").write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
