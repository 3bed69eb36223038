"""Streaming graph updates: delta buffers + incremental rebuild + log replay.

TPU-native equivalent of the DGS ingestion pipeline
(reference: dynamic_graph_service/ — Kafka dl2spl -> SamplingActor ->
RocksDB SampleStore, src/core/storage/sample_builder.h:28, and GL's
UpdateNodes/UpdateEdges ops core/operator/graph/node_updater.cc:25):

- ``UpdateBuffer`` accumulates node/edge deltas per type (the Kafka topic's
  role, in-process; any transport can feed it).
- ``apply_updates(graph)`` merges deltas into the host tables and
  invalidates device views; the next query's table fetch re-uploads the
  rebuilt CSR.  Rebuild cost is O(E log E) on host — the analogue of
  DGS's periodic pre-sampling, amortised over an update batch.
- ``UpdateLog`` appends records to disk and replays them after restart —
  the durability role of Kafka offsets + RocksDB backups
  (python/coordinator/checkpoint.py:44-197).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from graph_learn_tpu.core.store import EdgeTable, NodeSet, NodeTable
from graph_learn_tpu.errors import InvalidArgumentError, NotFoundError


class UpdateBuffer:
    def __init__(self):
        self.node_updates: Dict[str, List[dict]] = {}
        self.edge_updates: Dict[str, List[dict]] = {}

    def add_nodes(self, node_type: str, ids, weights=None, labels=None,
                  float_attrs=None, int_attrs=None, timestamps=None):
        self.node_updates.setdefault(node_type, []).append(dict(
            ids=np.asarray(ids, np.int64),
            weights=None if weights is None else np.asarray(weights, np.float32),
            labels=None if labels is None else np.asarray(labels, np.int32),
            float_attrs=(None if float_attrs is None
                         else np.asarray(float_attrs, np.float32)),
            int_attrs=(None if int_attrs is None
                       else np.asarray(int_attrs, np.int32)),
            timestamps=(None if timestamps is None
                        else np.asarray(timestamps, np.int64))))

    def add_edges(self, edge_type: str, src_ids, dst_ids, weights=None,
                  timestamps=None):
        self.edge_updates.setdefault(edge_type, []).append(dict(
            src_ids=np.asarray(src_ids, np.int64),
            dst_ids=np.asarray(dst_ids, np.int64),
            weights=None if weights is None else np.asarray(weights, np.float32),
            timestamps=(None if timestamps is None
                        else np.asarray(timestamps, np.int64))))

    def clear(self):
        self.node_updates.clear()
        self.edge_updates.clear()

    @property
    def empty(self) -> bool:
        return not self.node_updates and not self.edge_updates


def _concat_opt(a: Optional[np.ndarray], b: Optional[np.ndarray], n_a: int,
                n_b: int, fill=0):
    if a is None and b is None:
        return None
    if a is None:
        a = np.full((n_a,) + b.shape[1:], fill, b.dtype)
    if b is None:
        b = np.full((n_b,) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, b])


def apply_updates(graph, buf: UpdateBuffer):
    """Merge deltas into the store; device views rebuild lazily."""
    store = graph.store
    for t, batches in buf.node_updates.items():
        if t not in store.nodes:
            raise NotFoundError("unknown node type %r" % t)
        old = store.nodes[t]
        ids = np.concatenate([old.raw_ids] + [b["ids"] for b in batches])
        uniq, first = np.unique(ids, return_index=True)
        if uniq.size != ids.size:
            raise InvalidArgumentError(
                "node update contains existing ids (attribute overwrite is "
                "not yet supported; new nodes only)")

        new = NodeTable(
            t, old.decoder, ids,
            int_attrs=_cat_field(old, batches, "int_attrs"),
            float_attrs=_cat_field(old, batches, "float_attrs"),
            multival_attrs=old.multival_attrs,
            multival_lens=old.multival_lens,
            weights=_cat_field(old, batches, "weights"),
            labels=_cat_field(old, batches, "labels"),
            timestamps=_cat_field(old, batches, "timestamps"))
        store.add_node_table(new)
        # edge tables referencing this node type must grow their row space
        for e_t, et in list(store.edges.items()):
            if et.src_type == t or et.dst_type == t:
                store.add_edge_table(EdgeTable(
                    e_t, et.src_type, et.dst_type, et.decoder,
                    src=et.src, dst=et.dst,
                    num_src_nodes=store.node_table(et.src_type).num_nodes,
                    num_dst_nodes=store.node_table(et.dst_type).num_nodes,
                    weights=et.weights, labels=et.labels,
                    timestamps=(et.timestamps + et.ts_base
                                if et.timestamps is not None else None),
                    int_attrs=et.int_attrs, float_attrs=et.float_attrs,
                    multival_attrs=et.multival_attrs,
                    multival_lens=et.multival_lens))

    for t, batches in buf.edge_updates.items():
        if t not in store.edges:
            raise NotFoundError("unknown edge type %r" % t)
        old = store.edges[t]
        src_tab = store.node_table(old.src_type)
        dst_tab = store.node_table(old.dst_type)
        new_src = np.concatenate(
            [old.src] + [src_tab.index.lookup(b["src_ids"]).astype(np.int64)
                         for b in batches])
        new_dst = np.concatenate(
            [old.dst] + [dst_tab.index.lookup(b["dst_ids"]).astype(np.int64)
                         for b in batches])
        w = _cat_edge_field(old, batches, "weights")
        ts = _cat_edge_field(old, batches, "timestamps")
        new = EdgeTable(
            t, old.src_type, old.dst_type, old.decoder,
            src=new_src, dst=new_dst,
            num_src_nodes=src_tab.num_nodes,
            num_dst_nodes=dst_tab.num_nodes,
            weights=w, labels=_cat_edge_field(old, batches, "labels"),
            timestamps=ts)
        store.add_edge_table(new)
    from graph_learn_tpu.core.store import unify_ts_bases
    unify_ts_bases(store)
    buf.clear()


def _cat_field(old, batches, field):
    out = getattr(old, field)
    n_old = old.num_nodes
    for b in batches:
        nb = b["ids"].size
        out = _concat_opt(out, b.get(field), n_old, nb)
        n_old += nb
    return out


def _cat_edge_field(old, batches, field):
    raw = getattr(old, field)
    # note: old edge ts are rebased (+scaled); restore absolute first
    if field == "timestamps" and raw is not None:
        raw = raw.astype(np.int64) * old.ts_scale + old.ts_base
    out = raw
    n_old = old.num_edges
    for b in batches:
        nb = b["src_ids"].size
        out = _concat_opt(out, b.get(field), n_old, nb)
        n_old += nb
    return out


class UpdateLog:
    """Append-only JSONL update log with replay (durability tier)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def append_nodes(self, node_type: str, **kw):
        self._append({"kind": "nodes", "type": node_type,
                      **{k: np.asarray(v).tolist()
                         for k, v in kw.items() if v is not None}})

    def append_edges(self, edge_type: str, **kw):
        self._append({"kind": "edges", "type": edge_type,
                      **{k: np.asarray(v).tolist()
                         for k, v in kw.items() if v is not None}})

    def _append(self, rec: dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def offset(self) -> int:
        """Number of records durably appended so far — the checkpoint
        mark (DGS records the Kafka ready-offset the same way,
        python/coordinator/checkpoint.py:44-197)."""
        if not os.path.exists(self.path):
            return 0
        with open(self.path) as f:
            return sum(1 for _ in f)

    def replay(self, buf: UpdateBuffer, start: int = 0, upto=None):
        """Replay records [start, upto) into ``buf``; returns the count.

        ``upto=None`` replays to the end; a checkpoint's recorded offset
        passed as ``upto`` restores exactly the checkpointed state."""
        if not os.path.exists(self.path):
            return 0
        n = 0
        with open(self.path) as f:
            for i, line in enumerate(f):
                if i < start or (upto is not None and i >= upto):
                    continue
                rec = json.loads(line)
                kind = rec.pop("kind")
                t = rec.pop("type")
                if kind == "nodes":
                    buf.add_nodes(t, **rec)
                else:
                    buf.add_edges(t, **rec)
                n += 1
        return n


def expire_edges(graph, older_than, edge_types: Optional[List[str]] = None):
    """TTL eviction: drop edges with timestamp < ``older_than`` (absolute).

    Parity with the DGS RocksDB-TTL sample store
    (reference: dynamic_graph_service/src/core/storage/sample_store.h:71 —
    samples expire after a TTL so the served graph tracks a recency
    window).  Here eviction rebuilds the host CSR without the stale edges;
    device views refresh lazily (or via QueryService.refresh()).

    Returns {edge_type: num_dropped}.
    """
    store = graph.store
    dropped: Dict[str, int] = {}
    if edge_types is None:
        types = [t for t, et in store.edges.items()
                 if et.timestamps is not None]
    else:
        # undirected bipartite types load a '<type>_reverse' twin
        # (graph.py edge()); expire both or reverse hops keep serving
        # the dropped edges
        types = []
        for t in edge_types:
            types.append(t)
            rev = t + "_reverse"
            if rev in store.edges and rev not in edge_types:
                types.append(rev)
    for t in types:
        old = store.edges.get(t)
        if old is None:
            raise NotFoundError("unknown edge type %r" % t)
        if old.timestamps is None:
            raise InvalidArgumentError(
                "edge type %r is not timestamped" % t)
        keep = (old.timestamps.astype(np.int64) * old.ts_scale
                + old.ts_base) >= int(older_than)
        n_drop = int((~keep).sum())
        if n_drop == 0:
            dropped[t] = 0
            continue

        def sel(a):
            return None if a is None else a[keep]

        new = EdgeTable(
            t, old.src_type, old.dst_type, old.decoder,
            src=old.src[keep], dst=old.dst[keep],
            num_src_nodes=old.num_src_nodes,
            num_dst_nodes=old.num_dst_nodes,
            int_attrs=sel(old.int_attrs), float_attrs=sel(old.float_attrs),
            multival_attrs=sel(old.multival_attrs),
            multival_lens=sel(old.multival_lens),
            weights=sel(old.weights), labels=sel(old.labels),
            timestamps=(old.timestamps[keep].astype(np.int64) * old.ts_scale
                        + old.ts_base))
        store.add_edge_table(new)
        dropped[t] = n_drop
    from graph_learn_tpu.core.store import unify_ts_bases
    unify_ts_bases(graph.store)
    return dropped
