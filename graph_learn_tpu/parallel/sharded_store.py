"""Host-side build of a graph store sharded over the mesh "graph" axis.

This is the storage half of the sampled-path distribution design
(device half: core/sharding.py).  Reference equivalent: the distributed
GraphStore where each server holds hash-owned vertices/edges and bulk load
fans UpdateEdges/UpdateNodes requests to owners
(reference: core/graph/graph_store.cc:54-165 Initializer fan-out,
core/partition/hash_partitioner.h:90-92).  TPU redesign: contiguous RANGE
partition of each node type's dense index space — owner(i) = i // rows_per
_shard — because dense indices are already an arbitrary relabeling (the
ingest IdIndex), so ranges are as balanced as hashes, and ownership is one
shift-free compare on device instead of a hash.

Per edge type, each shard holds the CSR rows of the nodes it owns
(re-indexed locally, with GLOBAL neighbor/edge ids) plus an edge-row block
of the payload arrays.  Only id-sized candidate pools/CDFs are replicated.
Every array is stacked on a leading [P] axis so the whole store drops into
``shard_map`` with in_spec ``P('graph')``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import (GRAPH_AXIS, ShardedCSR,
                                           ShardedEdgeTable,
                                           ShardedNodeTable)
from graph_learn_tpu.core.store import (DeviceCSR, DeviceNodeTable,
                                        EdgeTable, NodeTable, _build_csr)
from graph_learn_tpu.ops.segment import pack_pairs_host, pad_lanes_host


def _rps(n: int, p: int, slack: float = 1.0) -> int:
    """Rows per shard under range partition; ``slack`` > 1 reserves tail
    capacity so appended rows land in existing padding and incremental
    refresh (ShardedTables.replace_blocks) only re-uploads the tail
    block instead of re-slicing every block.  Slacked capacities are
    QUANTIZED (to 64 rows) so small appends keep rows-per-shard — and
    with it every block's shape and ownership map — bit-stable; without
    quantization ceil(n*slack/p) would drift on every append and force
    full re-slices."""
    base = max(-(-int(n * slack) // p), 1)
    if slack > 1.0:
        base = -(-base // 64) * 64
    return base


def _pad_rows(a: Optional[np.ndarray], rows: int) -> Optional[np.ndarray]:
    if a is None:
        return None
    pad = rows - a.shape[0]
    if pad <= 0:
        return a
    return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))


def _stack_node_table(nt: NodeTable, p: int, slack: float = 1.0):
    """-> (stacked fields dict, replicated dict, meta)."""
    rps = _rps(nt.num_nodes, p, slack)
    fa = nt.float_attrs
    if fa is not None and conf.feature_dtype == "bfloat16":
        import ml_dtypes
        fa = fa.astype(ml_dtypes.bfloat16)
    fields = {
        "raw_ids": nt.raw_ids, "int_attrs": nt.int_attrs, "float_attrs": fa,
        "multival_attrs": nt.multival_attrs, "multival_lens": nt.multival_lens,
        "weights": nt.weights, "labels": nt.labels,
        "timestamps": nt.timestamps,
    }
    stacked = {}
    for name, arr in fields.items():
        if arr is None:
            continue
        shards = [_pad_rows(arr[s * rps:(s + 1) * rps], rps)
                  for s in range(p)]
        stacked[name] = np.stack(shards)
    repl = {}
    if nt.weights is not None and nt.num_nodes:
        w = np.maximum(nt.weights.astype(np.float64), 0.0)
        total = w.sum()
        if total <= 0:
            w = np.ones_like(w)
            total = w.sum()
        repl["cum_weights"] = np.cumsum(w / total).astype(np.float32)
    meta = {"rps": rps, "n_global": nt.num_nodes}
    return stacked, repl, meta


def _shard_csr_arrays(rows: np.ndarray, cols: np.ndarray, num_rows: int,
                      p: int, sort_key, sort_desc, weights, dst_in_degrees,
                      timestamps, minimal: bool, slack: float = 1.0):
    """Per-shard CSR arrays over a range partition of ``rows``.

    Neighbor ids and edge ids stay GLOBAL; only row indexing is local.
    All shards are padded to a common edge tile count so they stack.
    """
    rps = _rps(num_rows, p, slack)
    per = []
    for s in range(p):
        lo, hi = s * rps, (s + 1) * rps
        sel = np.nonzero((rows >= lo) & (rows < hi))[0]
        ro, nbr, eids, nbr_s, eid_s, cumw, cumind, nts = _build_csr(
            rows[sel] - lo, cols[sel], rps,
            None if sort_key is None else sort_key[sel], sort_desc,
            None if weights is None else weights[sel],
            dst_in_degrees,
            None if timestamps is None else timestamps[sel])
        # remap local edge ids -> global edge row ids
        eids = sel[eids].astype(np.int32) if sel.size else eids
        eid_s = sel[eid_s].astype(np.int32) if sel.size else eid_s
        per.append(dict(ro=ro, nbr=nbr, eids=eids, nbr_s=nbr_s, eid_s=eid_s,
                        cumw=cumw, cumind=cumind, nts=nts))
    e_max = max(x["nbr"].shape[0] for x in per)
    # slacked builds quantize the padded edge count coarsely (8 tiles) so
    # appends don't re-tile every shard when e_max*slack crosses a
    # 128-row boundary (incremental-refresh layout stability)
    _q = 1024 if slack > 1.0 else 128
    e_pad = -(-max(int(e_max * slack), 1) // _q) * _q
    maxdeg = max(int(np.diff(x["ro"]).max()) if x["ro"].size > 1 else 0
                 for x in per)

    def tile(name, dtype=None):
        outs = []
        for x in per:
            a = x[name]
            if a is None:
                return None
            if dtype is not None:
                a = a.astype(dtype)
            a = np.concatenate([a, np.zeros(e_pad - a.shape[0], a.dtype)])
            outs.append(pad_lanes_host(a))
        return np.stack(outs)

    stacked = {
        "row_offsets": np.stack([x["ro"] for x in per]),
        "off_pairs": np.stack(
            [pack_pairs_host(x["ro"][:-1], x["ro"][1:]) for x in per]),
        "nbr_tiled": tile("nbr"),
        "eid_tiled": tile("eids"),
    }
    if not minimal:
        for k_src, k_dst in (("nbr_s", "nbr_sorted_tiled"),
                             ("eid_s", "eid_sorted_tiled"),
                             ("cumw", "cumw_tiled"), ("cumind", "cumind_tiled")):
            t = tile(k_src)
            if t is not None:
                stacked[k_dst] = t
    t = tile("nts", np.int32)
    if t is not None:
        stacked["ts_tiled"] = t
    meta = {"rps": rps, "n_edges": int(e_pad), "max_degree": maxdeg}
    return stacked, meta


def _stack_edge_table(et: EdgeTable, p: int, minimal: bool,
                      slack: float = 1.0):
    src32 = et.src.astype(np.int32)
    dst32 = et.dst.astype(np.int32)
    out_arrs, out_meta = _shard_csr_arrays(
        et.src.astype(np.int64), dst32, et.num_src_nodes, p,
        et._sort_key, et._sort_desc, et.weights, et.in_degrees,
        et.timestamps, minimal, slack)
    stacked = {"out": out_arrs}
    meta = {"out": out_meta}
    if not minimal:
        inc_arrs, inc_meta = _shard_csr_arrays(
            et.dst.astype(np.int64), src32, et.num_dst_nodes, p,
            et._sort_key, et._sort_desc, et.weights, et.out_degrees,
            et.timestamps, minimal, slack)
        stacked["inc"] = inc_arrs
        meta["inc"] = inc_meta

    # edge-row payload blocks
    eps = _rps(et.num_edges, p, slack)
    fields = {"src": src32, "dst": dst32, "weights": et.weights,
              "labels": et.labels,
              "timestamps": None if et.timestamps is None
              else et.timestamps.astype(np.int32),
              "int_attrs": et.int_attrs, "float_attrs": et.float_attrs,
              "multival_attrs": et.multival_attrs,
              "multival_lens": et.multival_lens}
    for name, arr in fields.items():
        if arr is None:
            continue
        shards = [_pad_rows(arr[s * eps:(s + 1) * eps], eps)
                  for s in range(p)]
        stacked[name] = np.stack(shards)

    repl = {}
    if not minimal:
        def _pool(ids32, degs):
            uniq = np.unique(ids32)
            d = degs[uniq].astype(np.float64)
            tot = d.sum()
            cdf = np.cumsum(d / (tot if tot > 0 else 1.0)).astype(np.float32)
            return uniq.astype(np.int32), cdf

        repl["unique_dst"], repl["unique_dst_indeg_cdf"] = _pool(
            dst32, et.in_degrees)
        repl["unique_src"], repl["unique_src_outdeg_cdf"] = _pool(
            src32, et.out_degrees)
    meta["eps"] = eps
    meta["num_edges"] = et.num_edges
    return stacked, repl, meta


@dataclasses.dataclass
class ShardedTables:
    """Stacked [P, ...] + replicated device arrays + static metadata.

    ``stacked``/``repl`` are the two pytree args of the sharded plan
    (in_specs ``P('graph')`` / ``P()``); :meth:`view` rebuilds, inside the
    shard_map body, the tables dict that gsl/compile._execute expects.
    """

    stacked: Dict
    repl: Dict
    meta: Dict
    num_shards: int
    axis: str = GRAPH_AXIS

    def view(self, stacked, repl) -> Dict:
        """Shard-local blocks (leading axis dropped) -> plan tables dict."""
        out = {"nodes": {}, "edges": {}, "cond": repl.get("cond", {})}
        for t, fields in stacked["nodes"].items():
            m = self.meta["nodes"][t]
            local = DeviceNodeTable(
                raw_ids=fields["raw_ids"],
                int_attrs=fields.get("int_attrs"),
                float_attrs=fields.get("float_attrs"),
                multival_attrs=fields.get("multival_attrs"),
                multival_lens=fields.get("multival_lens"),
                weights=fields.get("weights"),
                labels=fields.get("labels"),
                timestamps=fields.get("timestamps"))
            out["nodes"][t] = ShardedNodeTable(
                local=local,
                cum_weights=repl["nodes"][t].get("cum_weights"),
                rows_per_shard=m["rps"], num_nodes_global=m["n_global"],
                axis=self.axis)
        for t, fields in stacked["edges"].items():
            m = self.meta["edges"][t]

            def csr(d, mm):
                return ShardedCSR(
                    local=DeviceCSR(
                        row_offsets=d["row_offsets"],
                        nbr_tiled=d["nbr_tiled"], eid_tiled=d["eid_tiled"],
                        off_pairs=d["off_pairs"],
                        n_edges=mm["n_edges"], max_degree=mm["max_degree"],
                        nbr_sorted_tiled=d.get("nbr_sorted_tiled"),
                        eid_sorted_tiled=d.get("eid_sorted_tiled"),
                        cumw_tiled=d.get("cumw_tiled"),
                        cumind_tiled=d.get("cumind_tiled"),
                        ts_tiled=d.get("ts_tiled")),
                    rows_per_shard=mm["rps"], axis=self.axis)

            r = repl["edges"][t]
            out["edges"][t] = ShardedEdgeTable(
                out=csr(fields["out"], m["out"]),
                inc=(csr(fields["inc"], m["inc"])
                     if "inc" in fields else None),
                src=fields["src"], dst=fields["dst"],
                int_attrs=fields.get("int_attrs"),
                float_attrs=fields.get("float_attrs"),
                multival_attrs=fields.get("multival_attrs"),
                multival_lens=fields.get("multival_lens"),
                weights=fields.get("weights"),
                labels=fields.get("labels"),
                timestamps=fields.get("timestamps"),
                unique_dst=r.get("unique_dst"),
                unique_dst_indeg_cdf=r.get("unique_dst_indeg_cdf"),
                unique_src=r.get("unique_src"),
                unique_src_outdeg_cdf=r.get("unique_src_outdeg_cdf"),
                edges_per_shard=m["eps"], num_edges_global=m["num_edges"],
                axis=self.axis)
        return out

    def bytes_per_device(self) -> int:
        """HBM bytes one device holds (its stack slice + replicated)."""
        st = sum(x.nbytes for x in jax.tree.leaves(self.stacked))
        rp = sum(x.nbytes for x in jax.tree.leaves(self.repl))
        return st // self.num_shards + rp

    def place(self, mesh: Mesh) -> "ShardedTables":
        """device_put the stacked arrays along mesh 'graph' (leading axis)
        and the replicated arrays everywhere, so the first step doesn't
        re-lay anything out.  The host (numpy) blocks are kept on the
        returned object (``host_stacked``) so a later
        :meth:`replace_blocks` can detect which shard blocks an update
        actually touched."""
        stacked = jax.device_put(
            self.stacked, NamedSharding(mesh, P(self.axis)))
        repl = jax.device_put(self.repl, NamedSharding(mesh, P()))
        out = dataclasses.replace(self, stacked=stacked, repl=repl)
        out.host_stacked = self.stacked
        out.mesh = mesh
        return out

    # set by place(); not dataclass fields so older pickles/uses are fine
    host_stacked: Optional[Dict] = None
    mesh: Optional[Mesh] = None

    def replace_blocks(self, new: "ShardedTables"):
        """Incremental refresh: upload only shard blocks an update touched.

        ``self`` must be a placed table set (device arrays + kept host
        blocks); ``new`` is a freshly host-built one with the SAME shard
        count.  For every leaf whose shape/dtype is unchanged, per-shard
        blocks are compared host-side and device buffers of UNCHANGED
        blocks are REUSED — only changed blocks are device_put.  Leaves
        whose layout changed (capacity overflow: eps/e_pad/rps moved) fall
        back to a full upload of that leaf.  Returns
        ``(placed_new, uploaded_bytes)``.

        Reference: DGS applies per-record updates to partitioned state
        (data_update_actor.act.h:29) instead of rebuilding stores; this is
        the device-array equivalent — O(delta) transfer, O(store) host
        hashing (the host store rebuild already costs that).
        """
        assert self.host_stacked is not None and self.mesh is not None, \
            "replace_blocks requires a placed ShardedTables"
        mesh = self.mesh
        uploaded = [0]

        def _merge(old_dev, old_host, new_host):
            if (old_host is None or old_dev is None
                    or old_host.shape != new_host.shape
                    or old_host.dtype != new_host.dtype):
                uploaded[0] += new_host.nbytes
                return jax.device_put(
                    new_host, NamedSharding(mesh, P(self.axis)))
            bufs = []
            for sh in old_dev.addressable_shards:
                s = sh.index[0].start or 0
                blk_new = new_host[s:s + 1]
                if np.array_equal(old_host[s:s + 1], blk_new):
                    bufs.append(sh.data)
                else:
                    uploaded[0] += blk_new.nbytes
                    bufs.append(jax.device_put(blk_new, sh.device))
            return jax.make_array_from_single_device_arrays(
                old_dev.shape, old_dev.sharding, bufs)

        def _walk(old_dev_d, old_host_d, new_host_d):
            out = {}
            for k, nh in new_host_d.items():
                od = old_dev_d.get(k) if old_dev_d else None
                oh = old_host_d.get(k) if old_host_d else None
                if isinstance(nh, dict):
                    out[k] = _walk(od or {}, oh or {}, nh)
                else:
                    out[k] = _merge(od, oh, nh)
            return out

        stacked = _walk(self.stacked, self.host_stacked, new.stacked)
        # replicated leaves are id-sized; re-upload wholesale (counted)
        uploaded[0] += sum(
            x.nbytes for x in jax.tree.leaves(new.repl)
            if hasattr(x, "nbytes"))
        repl = jax.device_put(new.repl, NamedSharding(mesh, P()))
        placed = dataclasses.replace(new, stacked=stacked, repl=repl)
        placed.host_stacked = new.stacked
        placed.mesh = mesh
        return placed, uploaded[0]


def _query_types(query):
    """(node_types, edge_types) the query's plan touches."""
    store = query.graph.store
    node_types, edge_types = set(), set()
    for n in query.dag.nodes:
        if n.edge_type:
            edge_types.add(n.edge_type)
            s, d = store.topology[n.edge_type]
            node_types.update((s, d))
        if n.node_type:
            ns = store.node_sets.get(n.node_type)
            node_types.add(ns.base_type if ns else n.node_type)
    return node_types, edge_types


def estimate_query_table_bytes(query) -> int:
    """Host-side estimate of the device bytes the query's tables need.

    Used by DistTrainer to decide between replicated placement and the
    range-partitioned store (VERDICT r2 weak #6: replication must not be
    the silent default once tables are large)."""
    store = query.graph.store
    node_types, edge_types = _query_types(query)
    total = 0
    for t in node_types:
        nt = store.node_table(t)
        for f in ("raw_ids", "int_attrs", "float_attrs", "multival_attrs",
                  "multival_lens", "weights", "labels", "timestamps"):
            a = getattr(nt, f, None)
            total += a.nbytes if a is not None else 0
    for t in edge_types:
        et = store.edge_table(t)
        for f in ("src", "dst", "weights", "labels", "timestamps",
                  "int_attrs", "float_attrs", "multival_attrs",
                  "multival_lens"):
            a = getattr(et, f, None)
            total += a.nbytes if a is not None else 0
        # CSR both directions roughly double the edge-id footprint
        total += 2 * et.src.nbytes
    return total


def build_sharded_tables(query, num_shards: int,
                         profile: Optional[str] = None,
                         slack: float = 1.0) -> ShardedTables:
    """Shard every table the query touches over ``num_shards``.

    Walks the same type set as Query.device_tables (gsl/compile.py) but
    produces [P, ...]-stacked host arrays instead of single-device tables.
    ``slack`` > 1 reserves per-shard tail capacity so streaming appends
    keep block layouts stable for incremental refresh (serving tier).
    """
    minimal = (profile or conf.storage_profile) == "minimal"
    store = query.graph.store
    node_types, edge_types = _query_types(query)
    stacked = {"nodes": {}, "edges": {}}
    repl = {"nodes": {}, "edges": {}}
    meta = {"nodes": {}, "edges": {}}
    for t in node_types:
        s, r, m = _stack_node_table(store.node_table(t), num_shards, slack)
        stacked["nodes"][t], repl["nodes"][t], meta["nodes"][t] = s, r, m
    for t in edge_types:
        s, r, m = _stack_edge_table(store.edge_table(t), num_shards, minimal,
                                    slack)
        stacked["edges"][t], repl["edges"][t], meta["edges"][t] = s, r, m
    # .where() conditional negatives: the ConditionTable (value-sorted
    # runs + CDFs, id-sized) stays REPLICATED — only the positive-dst
    # attribute probe crosses the graph axis at plan time
    from graph_learn_tpu.gsl.compile import build_condition_tables
    repl["cond"] = build_condition_tables(query)
    return ShardedTables(stacked=stacked, repl=repl, meta=meta,
                         num_shards=num_shards)
