"""Graph partitioning for multi-device full-graph aggregation.

TPU-native replacement of the reference's hash-partitioned graph servers
(reference: core/partition/hash_partitioner.h:90-92 hash(id) % servers,
fan-out/stitch op_runner.h:60-152): nodes are range-partitioned into P
contiguous shards; every edge lives on its *destination's* owner, so each
shard computes COMPLETE aggregations for its own nodes from local edges —
the only communication is fetching boundary ("halo") source-node features,
precomputed as static index sets and exchanged with one all_to_all over
ICI (parallel/halo.py).

Host-side build (numpy), producing a pytree of per-shard arrays stacked on
a leading shard axis so the whole structure drops into shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from graph_learn_tpu.core.store import EdgeTable


@struct.dataclass
class ShardedGraph:
    """Per-shard CSR + halo exchange plan; leading axis = shard."""

    # local CSR over owned dst rows; src references index the local
    # feature buffer [own_rows ++ halo_rows]
    row_offsets: jax.Array  # [P, rows_per_shard + 1]
    nbr_local: jax.Array  # [P, E_max] local-buffer src index (padded)
    edge_weight: Optional[jax.Array]  # [P, E_max]
    # halo plan: send_idx[p, q, s] = p-local row index to send to shard q
    send_idx: jax.Array  # [P, P, S_max] int32 (padded with 0)
    send_counts: jax.Array  # [P, P] int32
    # where received rows land in the local buffer: recv rows from shard q
    # occupy buffer slots [own + recv_offset[p, q], own + recv_offset[p, q+1})
    recv_offsets: jax.Array  # [P, P + 1] int32
    num_shards: int = struct.field(pytree_node=False, default=1)
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    halo_max: int = struct.field(pytree_node=False, default=0)
    s_max: int = struct.field(pytree_node=False, default=0)

    @property
    def buffer_rows(self) -> int:
        return self.rows_per_shard + self.halo_max


def partition_edges(et: EdgeTable, num_shards: int) -> ShardedGraph:
    """Range-partition dst nodes; build per-shard CSR + halo plan."""
    n = et.num_dst_nodes
    assert et.num_src_nodes == et.num_dst_nodes, \
        "full-graph partitioning assumes a homogeneous node space"
    P = num_shards
    rows = -(-n // P)  # rows per shard (last shard padded)

    src = et.src.astype(np.int64)
    dst = et.dst.astype(np.int64)
    w = et.weights

    owner = (dst // rows).astype(np.int32)
    shard_csr = []
    shard_halo = []
    for p in range(P):
        sel = owner == p
        s_p = src[sel]
        d_p = dst[sel] - p * rows  # local dst row
        w_p = w[sel] if w is not None else None
        # halo: sources not owned by p
        own_lo, own_hi = p * rows, (p + 1) * rows
        is_own = (s_p >= own_lo) & (s_p < own_hi)
        halo_ids = np.unique(s_p[~is_own])
        # local buffer index: own rows [0, rows), halo appended
        halo_pos = {g: rows + i for i, g in enumerate(halo_ids)}
        local_src = np.where(is_own, s_p - own_lo,
                             np.array([halo_pos.get(g, 0) for g in s_p]))
        # build CSR by dst row
        order = np.argsort(d_p, kind="stable")
        counts = np.bincount(d_p, minlength=rows)
        ro = np.zeros(rows + 1, np.int32)
        np.cumsum(counts, out=ro[1:])
        shard_csr.append((ro, local_src[order].astype(np.int32),
                          w_p[order] if w_p is not None else None))
        shard_halo.append(halo_ids)

    e_max = max(len(c[1]) for c in shard_csr)
    halo_max = max(len(h) for h in shard_halo) if P > 1 else 0

    # send plan: shard q needs halo_ids owned by p
    send_lists = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    for q in range(P):
        h = shard_halo[q]
        hp = (h // rows).astype(np.int32)
        for p in range(P):
            send_lists[p][q] = h[hp == p] - p * rows  # p-local rows
    s_max = max((len(send_lists[p][q]) for p in range(P) for q in range(P)),
                default=0)
    s_max = max(s_max, 1)

    send_idx = np.zeros((P, P, s_max), np.int32)
    send_counts = np.zeros((P, P), np.int32)
    recv_offsets = np.zeros((P, P + 1), np.int32)
    for p in range(P):
        for q in range(P):
            lst = send_lists[p][q]
            send_counts[p, q] = len(lst)
            send_idx[p, q, :len(lst)] = lst
    for q in range(P):
        # halo ids of q are globally sorted; rows from shard p form a
        # contiguous run (ids in [p*rows, (p+1)*rows)) — exactly the
        # all_to_all receive layout
        h = shard_halo[q]
        hp = (h // rows).astype(np.int32)
        cnt = np.bincount(hp, minlength=P)
        np.cumsum(cnt, out=recv_offsets[q, 1:])

    ro_s = np.stack([c[0] for c in shard_csr])
    nbr_s = np.stack([np.pad(c[1], (0, e_max - len(c[1]))) for c in shard_csr])
    if w is not None:
        w_s = np.stack([np.pad(c[2], (0, e_max - len(c[2])))
                        for c in shard_csr]).astype(np.float32)
    else:
        w_s = None

    return ShardedGraph(
        row_offsets=jnp.asarray(ro_s), nbr_local=jnp.asarray(nbr_s),
        edge_weight=None if w_s is None else jnp.asarray(w_s),
        send_idx=jnp.asarray(send_idx), send_counts=jnp.asarray(send_counts),
        recv_offsets=jnp.asarray(recv_offsets),
        num_shards=P, rows_per_shard=int(rows), halo_max=int(halo_max),
        s_max=int(s_max))


def shard_features(feats: np.ndarray, num_shards: int) -> np.ndarray:
    """[N, D] -> [P, rows, D] range-partitioned (zero-padded tail)."""
    n, d = feats.shape
    rows = -(-n // num_shards)
    pad = num_shards * rows - n
    fp = np.pad(np.asarray(feats), ((0, pad), (0, 0)))
    return fp.reshape(num_shards, rows, d)
