"""Subgraph induction over seed node sets.

Parity with the reference SubGraph sampler
(reference: graphlearn/src/core/operator/subgraph/subgraph_sampler.cc:27-80,
subgraph_utils.cc): take the (deduped) seed set as the node set, gather each
seed's full neighbor list, keep edges whose endpoint is also a seed, emit
local edge_index; optional BFS hop distances to a src/dst pair (SEAL).

TPU shape-static translation: seeds deduped with jnp.unique(size=b);
neighbor candidates capped at ``nbr_cap`` per seed; edge slots are
[b * nbr_cap] with a validity count (num_edges).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import row_sharded_sampler
from graph_learn_tpu.core.store import DeviceCSR
from graph_learn_tpu.core.values import SubGraphVal
from graph_learn_tpu.ops.segment import (flat_gather, row_bounds,
                                         row_bounds_csr)


@row_sharded_sampler
def _full_candidates(csr: DeviceCSR, rows: jax.Array, cap: int):
    """Per-row full-neighbor candidate window: (nbr, eid, deg).

    The only part of subgraph induction that reads the CSR — made
    shard-transparent via :func:`row_sharded_sampler` so SubGraph/SEAL
    induction runs on a graph-axis-sharded store exactly like any other
    shardable sampling request (reference: SubGraphSampler's full-neighbor
    pass is a regular distributed op, subgraph_sampler.cc:27-80 over the
    partitioned GraphStore).  The seed-set membership intersection, edge
    compaction and BFS distances downstream are id-sized and run
    replicated on every shard.
    """
    start, _, deg = row_bounds(csr.row_offsets,
                               jnp.minimum(rows, csr.num_rows - 1))
    ar = jnp.arange(cap, dtype=jnp.int32)[None, :]
    pos = start[:, None] + ar
    e = csr.n_edges
    posc = jnp.clip(pos, 0, max(e - 1, 0))
    nbr = flat_gather(csr.nbr_tiled, posc)
    eid = flat_gather(csr.eid_tiled, posc)
    return nbr, eid, deg


def induce_subgraph(csr: DeviceCSR, seeds: jax.Array,
                    nbr_cap: Optional[int] = None,
                    need_dist: bool = False,
                    num_bfs_steps: int = 3) -> SubGraphVal:
    """seeds [b] -> SubGraphVal with nodes = unique seeds.

    edge slots: E_cap = b * nbr_cap; valid edges are compacted to the front
    so downstream segment ops see contiguous real edges.
    """
    b = seeds.shape[0]
    cap = nbr_cap or conf.default_full_nbr_num
    seeds = seeds.astype(jnp.int32)
    # dedup (sorted); padding slots replicate the first seed and are
    # deduplicated by construction of `unique`
    fill = jnp.int32(2**31 - 1)
    uniq = jnp.unique(seeds, size=b, fill_value=fill)
    num_nodes = jnp.sum(uniq < fill).astype(jnp.int32)

    # full-neighbor candidates per unique seed (shard-transparent)
    nbr, eid, deg = _full_candidates(csr, uniq, cap)
    ar = jnp.arange(cap, dtype=jnp.int32)[None, :]
    row_valid = (ar < deg[:, None]) & (jnp.arange(b)[:, None] < num_nodes)

    # membership of neighbor in unique seed set (uniq is sorted; padding is
    # int32 max so searchsorted stays correct)
    loc = jnp.searchsorted(uniq, nbr)
    loc = jnp.clip(loc, 0, b - 1)
    member = (uniq[loc] == nbr) & (loc < num_nodes)
    keep = row_valid & member

    src_local = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                                 (b, cap))
    flat_keep = keep.reshape(-1)
    flat_src = src_local.reshape(-1)
    flat_dst = loc.reshape(-1)
    flat_eid = eid.reshape(-1)

    # compact valid edges to the front: stable sort by ~keep
    order = jnp.argsort(~flat_keep, stable=True)
    num_edges = jnp.sum(flat_keep).astype(jnp.int32)
    ei = jnp.stack([flat_src[order], flat_dst[order]], axis=0)
    eids = flat_eid[order]
    slot_valid = jnp.arange(ei.shape[1]) < num_edges
    ei = jnp.where(slot_valid[None, :], ei, 0)
    eids = jnp.where(slot_valid, eids, -1)

    dist_src = dist_dst = None
    if need_dist:
        # BFS distances from local node 0 (src) and 1 (dst) over the
        # induced edges (SEAL's double-radius labeling,
        # subgraph_sampler.cc dist_to_src/dist_to_dst)
        dist_src = _bfs_local(ei, slot_valid, b, jnp.int32(0), num_bfs_steps)
        dist_dst = _bfs_local(ei, slot_valid, b, jnp.int32(1), num_bfs_steps)

    return SubGraphVal(node_ids=uniq, num_nodes=num_nodes, edge_index=ei,
                       num_edges=num_edges, edge_ids=eids,
                       dist_to_src=dist_src, dist_to_dst=dist_dst)


def induce_batched(csr: DeviceCSR, seed_sets: jax.Array,
                   nbr_cap: Optional[int] = None,
                   need_dist: bool = False,
                   num_bfs_steps: int = 3) -> SubGraphVal:
    """Per-sample induction: seed_sets [B, S] -> stacked SubGraphVal.

    Equivalent of the reference per-sample SubGraph sampling batched by
    BatchGraph.from_graphs (each SEAL link gets its own enclosing
    subgraph); vmapped so all B inductions run as one fused program.
    """
    fn = lambda s: induce_subgraph(csr, s, nbr_cap=nbr_cap,
                                   need_dist=need_dist,
                                   num_bfs_steps=num_bfs_steps)
    return jax.vmap(fn)(seed_sets)


def _bfs_local(edge_index: jax.Array, edge_valid: jax.Array, n: int,
               root: jax.Array, steps: int) -> jax.Array:
    """Hop distance from `root` over local edges; unreachable = steps+1."""
    inf = jnp.int32(steps + 1)
    dist = jnp.full((n,), inf, jnp.int32).at[root].set(0)
    src, dst = edge_index[0], edge_index[1]

    def body(i, dist):
        d_src = dist[src]
        cand = jnp.where(edge_valid & (d_src < inf), d_src + 1, inf)
        # undirected relax both directions
        new = jax.ops.segment_min(cand, dst, num_segments=n)
        d_dst = dist[dst]
        cand2 = jnp.where(edge_valid & (d_dst < inf), d_dst + 1, inf)
        new2 = jax.ops.segment_min(cand2, src, num_segments=n)
        return jnp.minimum(dist, jnp.minimum(new, new2))

    return jax.lax.fori_loop(0, steps, body, dist)
