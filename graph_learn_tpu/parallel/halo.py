"""Halo exchange + sharded full-graph SpMM over the 'graph' mesh axis.

The distributed aggregation core: each shard owns its dst rows' edges
(parallel/partition.py), so one all_to_all of boundary src-node features
over ICI makes every aggregation fully local.  This subsumes the
reference's per-request RPC fan-out/stitch (op_runner.h:60-152,
stitcher.h:26-120) with a single static collective, overlapped by XLA with
the local gather+segment-sum.

Full-graph (all-neighbor) GCN/SAGE aggregation at scale is something the
reference cannot express at all — its scale story is sampling through
graph servers; here the whole graph lives in sharded HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_learn_tpu.parallel.partition import ShardedGraph


def _halo_exchange_local(sg: ShardedGraph, x_own, axis_name: str):
    """Inside shard_map: x_own [rows, D] -> halo rows [halo_max, D]."""
    p = jax.lax.axis_index(axis_name)
    # send_idx/send_counts rows for *this* shard
    send_idx = sg.send_idx[0]  # [P, S_max] (leading shard axis mapped)
    send_counts = sg.send_counts[0]  # [P]
    recv_offsets = sg.recv_offsets[0]  # [P + 1]
    n_shards = sg.num_shards
    s_max = sg.s_max
    d = x_own.shape[-1]

    send_buf = x_own[send_idx.reshape(-1)].reshape(n_shards, s_max, d)
    # all_to_all: block q of our send_buf goes to device q
    recv = jax.lax.all_to_all(send_buf[None], axis_name, split_axis=1,
                              concat_axis=0)
    # recv: [P, 1, S_max, d] -> [P, S_max, d]; block p holds rows from shard p
    recv = recv.reshape(n_shards, s_max, d)

    halo = jnp.zeros((max(sg.halo_max, 1), d), x_own.dtype)
    slot = jnp.arange(s_max, dtype=jnp.int32)[None, :]  # [1, S_max]
    # counts of rows this shard RECEIVES from each p
    recv_counts = recv_offsets[1:] - recv_offsets[:-1]  # [P]
    dest = recv_offsets[:-1][:, None] + slot  # [P, S_max]
    valid = slot < recv_counts[:, None]
    dest = jnp.where(valid, dest, sg.halo_max)  # dump padding out of range
    halo = jnp.zeros((max(sg.halo_max, 1) + 1, d), x_own.dtype)
    halo = halo.at[dest.reshape(-1)].set(recv.reshape(-1, d), mode="drop")
    return halo[:max(sg.halo_max, 1)]


def sharded_spmm(sg: ShardedGraph, x_shards: jax.Array, mesh: Mesh,
                 agg: str = "sum", axis_name: str = "graph") -> jax.Array:
    """Distributed SpMM: out[p] = aggregate over local CSR of [own ++ halo].

    x_shards: [P, rows, D] sharded over `axis_name`.
    Returns [P, rows, D_out=D] aggregated dst features, same sharding.
    """
    from jax import shard_map

    spec_graph = P(axis_name)

    def local(sg_l, x_l):
        x_own = x_l[0]  # [rows, D]
        if sg_l.num_shards > 1 and sg_l.halo_max > 0:
            halo = _halo_exchange_local(sg_l, x_own, axis_name)
        else:
            halo = jnp.zeros((1, x_own.shape[-1]), x_own.dtype)
        buf = jnp.concatenate([x_own, halo], axis=0)
        ro = sg_l.row_offsets[0]
        nbr = sg_l.nbr_local[0]
        rows = sg_l.rows_per_shard
        e_max = nbr.shape[0]
        # edge -> dst row id (searchsorted over offsets), padded edges -> rows
        eidx = jnp.arange(e_max, dtype=jnp.int32)
        dst_row = jnp.searchsorted(ro, eidx, side="right") - 1
        valid = eidx < ro[-1]
        msgs = buf[nbr]
        if sg_l.edge_weight is not None and agg == "weighted_sum":
            msgs = msgs * sg_l.edge_weight[0][:, None]
        msgs = jnp.where(valid[:, None], msgs, 0.0)
        seg = jnp.where(valid, dst_row, rows)
        out = jax.ops.segment_sum(msgs, seg, num_segments=rows + 1)[:rows]
        if agg == "mean":
            deg = ro[1:] - ro[:-1]
            out = out / jnp.maximum(deg, 1).astype(out.dtype)[:, None]
        return out[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(jax.tree.map(lambda _: spec_graph, sg),
                             spec_graph),
                   out_specs=spec_graph)
    return fn(sg, x_shards)
