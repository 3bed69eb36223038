"""Ingest-time locality reordering: relabel nodes so neighbors share tiles.

TPU-native optimization with no reference equivalent: every feature
gather on TPU fetches the (8-16 row, 128 lane) TILE containing the
requested row, so a random node labeling wastes 8-16x HBM bandwidth on
hop lookups.  BFS (Cuthill-McKee-style) relabeling clusters topological
neighborhoods into adjacent indices, so the fanout gathers of one seed
hit few distinct tiles on community-structured graphs.  (The reference's
CPU storage is pointer-chasing either way; this lever only exists on
tiled memory — hence ingest-time, like the adjacency sort in
memory_adj_matrix.cc:60-66.)

Enabled via ``Graph().init(reorder="bfs")``.  Only homogeneous edge
types (src_type == dst_type) drive a type's ordering; types without such
edges keep their load order.

Measured (v5e, 200k-node 2000-community graph, 2-hop fanout [15,10]):
NEUTRAL under XLA's current gather lowering — the gather issues a tile
fetch per index without cross-index tile reuse, so locality does not yet
pay.  Kept as the substrate for a future Pallas gather that batches
same-tile indices, and for multi-host partitioning (contiguous-range
shards become community-aligned).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def bfs_order(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Returns perm with perm[old_index] = new_index (BFS/CM ordering).

    Symmetric BFS from the highest-degree unvisited node of each
    component; within a frontier, nodes keep ascending-degree order
    (Cuthill-McKee).  Pure numpy frontier expansion.
    """
    deg = np.bincount(src, minlength=n) + np.bincount(dst, minlength=n)
    # symmetric CSR
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    order_e = np.argsort(s2, kind="stable")
    s2, d2 = s2[order_e], d2[order_e]
    counts = np.bincount(s2, minlength=n)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])

    visited = np.zeros(n, bool)
    out: List[np.ndarray] = []
    emitted = 0
    seeds = np.argsort(-deg, kind="stable")
    for seed in seeds:
        if visited[seed] or deg[seed] == 0:
            continue
        visited[seed] = True
        frontier = np.array([seed], np.int64)
        out.append(frontier)
        emitted += 1
        while frontier.size:
            # all neighbors of the frontier, dedup to unvisited
            segs = [d2[offs[v]:offs[v + 1]] for v in frontier]
            nxt = np.unique(np.concatenate(segs)) if segs else \
                np.empty(0, np.int64)
            nxt = nxt[~visited[nxt]]
            if nxt.size == 0:
                break
            # ascending degree within the level (Cuthill-McKee)
            nxt = nxt[np.argsort(deg[nxt], kind="stable")]
            visited[nxt] = True
            out.append(nxt)
            emitted += nxt.size
        if emitted >= n:
            break
    rest = np.flatnonzero(~visited)
    if rest.size:
        out.append(rest)
    new_to_old = np.concatenate(out) if out else np.arange(n)
    perm = np.empty(n, np.int64)
    perm[new_to_old] = np.arange(n)
    return perm.astype(np.int32)


def reorder_store(store, strategy: str = "bfs") -> Dict[str, np.ndarray]:
    """Relabel every node type with homogeneous edges; remap all tables.

    Returns {node_type: perm} for the types that were reordered.  Must run
    before any device view is built.
    """
    if strategy != "bfs":
        raise ValueError("unknown reorder strategy %r" % strategy)
    perms: Dict[str, np.ndarray] = {}
    for ntype, nt in store.nodes.items():
        srcs, dsts = [], []
        for et in store.edges.values():
            if et.src_type == ntype and et.dst_type == ntype:
                srcs.append(et.src)
                dsts.append(et.dst)
        if not srcs:
            continue
        perm = bfs_order(nt.num_nodes, np.concatenate(srcs),
                         np.concatenate(dsts))
        perms[ntype] = perm

    from graph_learn_tpu.core.store import EdgeTable, IdIndex

    for ntype, perm in perms.items():
        nt = store.nodes[ntype]
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size, dtype=perm.dtype)  # new -> old
        for f in ("raw_ids", "int_attrs", "float_attrs", "multival_attrs",
                  "multival_lens", "weights", "labels", "timestamps"):
            a = getattr(nt, f)
            if a is not None:
                setattr(nt, f, a[inv])
        nt.index = IdIndex(nt.raw_ids)
        nt._device = {}

    for e_t, et in list(store.edges.items()):
        ps = perms.get(et.src_type)
        pd = perms.get(et.dst_type)
        if ps is None and pd is None:
            continue
        src = ps[et.src] if ps is not None else et.src
        dst = pd[et.dst] if pd is not None else et.dst
        store.edges[e_t] = EdgeTable(
            e_t, et.src_type, et.dst_type, et.decoder,
            src=src, dst=dst,
            num_src_nodes=et.num_src_nodes, num_dst_nodes=et.num_dst_nodes,
            int_attrs=et.int_attrs, float_attrs=et.float_attrs,
            multival_attrs=et.multival_attrs, multival_lens=et.multival_lens,
            weights=et.weights, labels=et.labels,
            timestamps=(et.timestamps.astype(np.int64) * et.ts_scale
                        + et.ts_base
                        if et.timestamps is not None else None))

    for ns in store.node_sets.values():
        p = perms.get(ns.base_type)
        if p is not None and ns.indices is not None:
            ns.indices = p[ns.indices].astype(np.int32)
            ns._device = {}
    return perms
