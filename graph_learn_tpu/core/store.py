"""HBM-resident graph store: node tables + per-edge-type CSR.

TPU-native redesign of the reference storage layer
(reference: graphlearn/src/core/graph/graph_store.h:33-66,
storage/memory_adj_matrix.cc:51-150, storage/compressed_memory_graph_storage.cc,
storage/auto_indexing.cc).  Instead of vector-of-vector adjacency behind a
singleton served over gRPC, the graph is built once on the host as flat numpy
CSR arrays and transferred to device HBM; every sampler is then a jitted
gather over these static-shape arrays.

Design points:
- ids: arbitrary int64 source ids are remapped to dense int32 indices at
  build (the reference's ``AutoIndex``); all device traffic uses dense
  indices, raw ids are a [N] lookup array.
- adjacency order: per-row neighbors sorted by timestamp asc if
  timestamped, else weight desc if weighted, else insertion order —
  matching memory_adj_matrix.cc:60-66/105-150, so top-k sampling is
  "first k of the row".
- a second per-row ordering sorted by neighbor id supports O(log d)
  membership bisection (negative sampling, subgraph induction) without
  hash sets.
- per-row normalised cumulative weights support inverse-CDF weighted
  sampling (replaces the reference's AliasMethod,
  sampler/alias_method.cc:29-49 — bisection is branch-free and needs no
  table build, a better fit for the VPU than alias tables).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.errors import InvalidArgumentError, NotFoundError


# ---------------------------------------------------------------------------
# Device-side views (pytrees passed into jitted plan functions)
# ---------------------------------------------------------------------------


@struct.dataclass
class DeviceNodeTable:
    """Per-node-type payload arrays, device-resident."""

    raw_ids: jax.Array  # [N] int64
    int_attrs: Optional[jax.Array] = None  # [N, ni] int32
    float_attrs: Optional[jax.Array] = None  # [N, nf] f32
    multival_attrs: Optional[jax.Array] = None  # [N, nm, L] int32
    multival_lens: Optional[jax.Array] = None  # [N, nm] int32
    weights: Optional[jax.Array] = None  # [N] f32
    labels: Optional[jax.Array] = None  # [N] int32
    timestamps: Optional[jax.Array] = None  # [N] int64
    # cumulative normalised node weights for node_weight negative sampling
    cum_weights: Optional[jax.Array] = None  # [N] f32

    @property
    def num_nodes(self) -> int:
        return self.raw_ids.shape[0]


@struct.dataclass
class DeviceCSR:
    """One direction of adjacency in CSR form.

    Neighbor/edge-id arrays live ONLY as lane-tiled [ceil(E/128), 128]
    views (ops/segment.py flat_gather): XLA's scalar gather moves a 512B
    tile per element, so every sampler fetch is a 128-lane row gather +
    on-chip lane select instead.  ids and edge ids are SEPARATE tables so
    (a) XLA DCEs the eid gather when a hop never touches edge payload and
    (b) each table alone stays within the fast on-chip working-set tier
    for mid-size graphs.  ``off_pairs`` interleaves (start, end) row
    bounds so both come from one fetch.
    """

    row_offsets: jax.Array  # [Nrow+1] int32
    nbr_tiled: jax.Array  # [ceil(E/128), 128] int32, build order
    eid_tiled: jax.Array  # [ceil(E/128), 128] int32
    off_pairs: jax.Array  # [ceil(2N/128), 128] int32
    n_edges: int = struct.field(pytree_node=False, default=0)
    # static max row degree: bounds per-row bisection to
    # ceil(log2(max_degree)) iterations instead of ceil(log2(E))
    max_degree: int = struct.field(pytree_node=False, default=0)
    # id-sorted ordering of the same rows, for bisection membership
    # (None under the "minimal" storage profile):
    nbr_sorted_tiled: Optional[jax.Array] = None  # [ceil(E/128), 128] int32
    eid_sorted_tiled: Optional[jax.Array] = None
    # inverse-CDF tables (None unless the matching sampler is enabled):
    cumw_tiled: Optional[jax.Array] = None  # f32, per-row normalised cumsum
    cumind_tiled: Optional[jax.Array] = None  # f32, per-row, ∝ dst in-degree
    # edge timestamps in CSR order (ascending per row when timestamped),
    # enabling exact before-t prefix sampling (temporal graphs)
    ts_tiled: Optional[jax.Array] = None  # int32 (rebased)

    @property
    def num_rows(self) -> int:
        return self.row_offsets.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.n_edges

    def _flat(self, tiled):
        return (None if tiled is None
                else tiled.reshape(-1)[:self.n_edges])

    @property
    def nbr_ids(self) -> jax.Array:
        """Flat [E] view (test/debug convenience; hot paths use tiled)."""
        return self._flat(self.nbr_tiled)

    @property
    def nbr_edge_ids(self) -> jax.Array:
        return self._flat(self.eid_tiled)

    @property
    def nbr_ids_sorted(self):
        return self._flat(self.nbr_sorted_tiled)

    @property
    def nbr_edge_ids_sorted(self):
        return self._flat(self.eid_sorted_tiled)

    @property
    def cum_weights(self):
        return self._flat(self.cumw_tiled)

    @property
    def cum_in_degrees(self):
        return self._flat(self.cumind_tiled)

    @property
    def nbr_ts(self):
        return self._flat(self.ts_tiled)

    def degrees(self) -> jax.Array:
        return self.row_offsets[1:] - self.row_offsets[:-1]


@struct.dataclass
class DeviceEdgeTable:
    """Per-edge-type topology (both directions) + edge payload."""

    out: DeviceCSR  # src -> dst
    src: jax.Array  # [E] int32, edge-row order
    dst: jax.Array  # [E] int32
    inc: Optional[DeviceCSR] = None  # dst -> src (None in minimal profile)
    int_attrs: Optional[jax.Array] = None
    float_attrs: Optional[jax.Array] = None
    multival_attrs: Optional[jax.Array] = None
    multival_lens: Optional[jax.Array] = None
    weights: Optional[jax.Array] = None  # [E] f32
    labels: Optional[jax.Array] = None
    timestamps: Optional[jax.Array] = None  # [E] int64
    # negative-sampling candidate tables (reference GetAllDstIds):
    unique_dst: Optional[jax.Array] = None  # [Du] sorted unique dst indices
    unique_dst_indeg_cdf: Optional[jax.Array] = None  # [Du] in-degree CDF
    # reversed-side pools for inNeg:
    unique_src: Optional[jax.Array] = None
    unique_src_outdeg_cdf: Optional[jax.Array] = None

    @property
    def num_edges(self) -> int:
        return self.src.shape[0]


@struct.dataclass
class DeviceNodeSet:
    """A traversable seed set (masked split or full table)."""

    indices: jax.Array  # [M] int32 dense indices into the base node table
    weights: Optional[jax.Array] = None  # [M] f32


# ---------------------------------------------------------------------------
# Host-side build
# ---------------------------------------------------------------------------


def _put(x):
    return jnp.asarray(x)


def _opt_put(x):
    return None if x is None else jnp.asarray(x)


def _placement_key() -> str:
    """Cache key for lazily-built device views.

    A host-tier Dataset (gsl/dataset.py tier='host') builds its tables
    under ``jax.default_device(cpu)`` so the graph stays in host RAM;
    keying the per-table cache by the active default device keeps those
    host-pinned views from leaking into device-tier consumers (and vice
    versa) when both tiers read the same store."""
    d = jax.config.jax_default_device
    return "default" if d is None else str(d)


class IdIndex:
    """raw int64 id -> dense int32 index (reference AutoIndex)."""

    def __init__(self, raw_ids: np.ndarray):
        self.raw_ids = raw_ids.astype(np.int64)
        order = np.argsort(self.raw_ids, kind="stable")
        self._sorted = self.raw_ids[order]
        self._perm = order.astype(np.int32)
        if self._sorted.size and np.any(self._sorted[1:] == self._sorted[:-1]):
            raise InvalidArgumentError("duplicate node ids in table")

    def __len__(self):
        return self.raw_ids.size

    def lookup(self, ids: np.ndarray, strict: bool = True) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        pos = np.searchsorted(self._sorted, ids)
        pos = np.clip(pos, 0, max(len(self._sorted) - 1, 0))
        found = self._sorted[pos] == ids if len(self._sorted) else np.zeros(ids.shape, bool)
        if strict and not np.all(found):
            missing = ids[~found]
            raise NotFoundError(
                "%d ids not present in node table (e.g. %r)"
                % (missing.size, missing[:5].tolist()))
        out = self._perm[pos].astype(np.int32)
        out[~found] = -1
        return out


class NodeTable:
    """Host-side node table (numpy) + lazily-created device view."""

    def __init__(self, type_name: str, decoder: Decoder, raw_ids: np.ndarray,
                 int_attrs=None, float_attrs=None, multival_attrs=None,
                 multival_lens=None, weights=None, labels=None,
                 timestamps=None):
        self.type_name = type_name
        self.decoder = decoder
        self.raw_ids = raw_ids.astype(np.int64)
        self.index = IdIndex(self.raw_ids)
        n = len(self.raw_ids)

        def chk(a, name, dtype):
            if a is None:
                return None
            a = np.asarray(a, dtype=dtype)
            if a.shape[0] != n:
                raise InvalidArgumentError(
                    "%s rows %d != ids %d for %s" % (name, a.shape[0], n, type_name))
            return a

        self.int_attrs = chk(int_attrs, "int_attrs", np.int32)
        self.float_attrs = chk(float_attrs, "float_attrs", np.float32)
        self.multival_attrs = chk(multival_attrs, "multival_attrs", np.int32)
        self.multival_lens = chk(multival_lens, "multival_lens", np.int32)
        self.weights = chk(weights, "weights", np.float32)
        self.labels = chk(labels, "labels", np.int32)
        self.timestamps = chk(timestamps, "timestamps", np.int64)
        self._device: Dict[str, DeviceNodeTable] = {}

    @property
    def num_nodes(self) -> int:
        return len(self.raw_ids)

    def device(self) -> DeviceNodeTable:
        pk = _placement_key()
        if pk not in self._device:
            cum = None
            if self.weights is not None and self.num_nodes:
                w = np.maximum(self.weights.astype(np.float64), 0.0)
                total = w.sum()
                if total <= 0:
                    w = np.ones_like(w)
                    total = w.sum()
                cum = np.cumsum(w / total).astype(np.float32)
            fa = self.float_attrs
            if fa is not None and conf.feature_dtype == "bfloat16":
                # halves the HBM traffic of every feature gather — the
                # dominant cost of the fused train step
                import ml_dtypes
                fa = fa.astype(ml_dtypes.bfloat16)
            self._device[pk] = DeviceNodeTable(
                raw_ids=_put(self.raw_ids),
                int_attrs=_opt_put(self.int_attrs),
                float_attrs=_opt_put(fa),
                multival_attrs=_opt_put(self.multival_attrs),
                multival_lens=_opt_put(self.multival_lens),
                weights=_opt_put(self.weights),
                labels=_opt_put(self.labels),
                timestamps=_opt_put(self.timestamps),
                cum_weights=_opt_put(cum),
            )
        return self._device[pk]


def _build_csr(rows: np.ndarray, cols: np.ndarray, num_rows: int,
               sort_key: Optional[np.ndarray], sort_desc: bool,
               weights: Optional[np.ndarray],
               dst_in_degrees: Optional[np.ndarray],
               timestamps: Optional[np.ndarray] = None) -> Tuple[np.ndarray, ...]:
    """Build CSR arrays.

    Returns (row_offsets, nbr, eid, nbr_s, eid_s, cumw, cumind, nbr_ts)."""
    e = rows.size
    eid = np.arange(e, dtype=np.int64)
    # primary sort by row; stable so insertion order is kept within rows
    if sort_key is not None:
        key = -sort_key if sort_desc else sort_key
        order = np.lexsort((key, rows))
    else:
        order = np.argsort(rows, kind="stable")
    r = rows[order]
    nbr = cols[order].astype(np.int32)
    eids = eid[order].astype(np.int32)
    counts = np.bincount(r, minlength=num_rows).astype(np.int64)
    row_offsets = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=row_offsets[1:])

    # id-sorted secondary ordering
    order2 = np.lexsort((cols, rows))
    nbr_s = cols[order2].astype(np.int32)
    eid_s = eid[order2].astype(np.int32)

    def _segment_cdf(vals: np.ndarray) -> np.ndarray:
        """Per-row normalised inclusive cumsum of vals (aligned with nbr)."""
        v = np.maximum(vals.astype(np.float64), 0.0)
        row_of = np.repeat(np.arange(num_rows), counts)
        seg_sum = np.bincount(row_of, weights=v, minlength=num_rows)
        # rows with all-zero weight fall back to uniform
        zero = np.repeat(seg_sum <= 0, counts)
        v = np.where(zero, 1.0, v)
        seg_sum = np.bincount(row_of, weights=v, minlength=num_rows)
        cs = np.cumsum(v)
        start = np.minimum(row_offsets[:-1], max(e - 1, 0))
        per_row = cs - np.repeat((cs - v)[start], counts)
        denom = np.repeat(np.where(seg_sum > 0, seg_sum, 1.0), counts)
        return (per_row / denom).astype(np.float32)

    cumw = None
    if weights is not None and e:
        cumw = _segment_cdf(weights[order])
    cumind = None
    if dst_in_degrees is not None and e:
        cumind = _segment_cdf(dst_in_degrees[nbr].astype(np.float64))
    nbr_ts = None
    if timestamps is not None and e:
        nbr_ts = timestamps[order]
    return row_offsets, nbr, eids, nbr_s, eid_s, cumw, cumind, nbr_ts


class EdgeTable:
    """Host-side edge table with bidirectional CSR."""

    def __init__(self, type_name: str, src_type: str, dst_type: str,
                 decoder: Decoder, src: np.ndarray, dst: np.ndarray,
                 num_src_nodes: int, num_dst_nodes: int,
                 int_attrs=None, float_attrs=None, multival_attrs=None,
                 multival_lens=None, weights=None, labels=None,
                 timestamps=None):
        self.type_name = type_name
        self.src_type = src_type
        self.dst_type = dst_type
        self.decoder = decoder
        self.src = src.astype(np.int64)
        self.dst = dst.astype(np.int64)
        self.num_src_nodes = num_src_nodes
        self.num_dst_nodes = num_dst_nodes
        self.weights = None if weights is None else np.asarray(weights, np.float32)
        self.labels = None if labels is None else np.asarray(labels, np.int32)
        self.timestamps = (None if timestamps is None
                           else np.asarray(timestamps, np.int64))
        # device arrays are int32 (x64 disabled); rebase timestamps so
        # epoch-style values fit — ``ts_base``/``ts_scale`` restore
        # absolute time: abs = ts * ts_scale + ts_base
        self.ts_base = 0
        self.ts_scale = 1
        if self.timestamps is not None and self.timestamps.size:
            self.ts_base = int(self.timestamps.min())
            self.timestamps = self.timestamps - self.ts_base
        self.int_attrs = None if int_attrs is None else np.asarray(int_attrs, np.int32)
        self.float_attrs = (None if float_attrs is None
                            else np.asarray(float_attrs, np.float32))
        self.multival_attrs = (None if multival_attrs is None
                               else np.asarray(multival_attrs, np.int32))
        self.multival_lens = (None if multival_lens is None
                              else np.asarray(multival_lens, np.int32))
        self._device: Dict[str, DeviceEdgeTable] = {}

        # adjacency sort key: ts asc > weight desc > insertion
        if self.timestamps is not None:
            self._sort_key, self._sort_desc = self.timestamps.astype(np.float64), False
        elif self.weights is not None:
            self._sort_key, self._sort_desc = self.weights.astype(np.float64), True
        else:
            self._sort_key, self._sort_desc = None, False

        self.out_degrees = np.bincount(
            self.src.astype(np.int64), minlength=num_src_nodes).astype(np.int32)
        self.in_degrees = np.bincount(
            self.dst.astype(np.int64), minlength=num_dst_nodes).astype(np.int32)

    @property
    def num_edges(self) -> int:
        return self.src.size

    def device(self) -> DeviceEdgeTable:
        pk = _placement_key()
        if pk not in self._device:
            minimal = conf.storage_profile == "minimal"
            src32 = self.src.astype(np.int32)
            dst32 = self.dst.astype(np.int32)
            from graph_learn_tpu.ops.segment import (pack_pairs_host,
                                                     pad_lanes_host)

            def _off_pairs(ro_):
                return pack_pairs_host(ro_[:-1], ro_[1:])

            ro, nbr, eids, nbr_s, eid_s, cumw, cumind, nts = _build_csr(
                self.src, dst32, self.num_src_nodes,
                self._sort_key, self._sort_desc, self.weights,
                self.in_degrees, self.timestamps)
            def _tile(a):
                return None if a is None else _put(pad_lanes_host(a))

            def _maxdeg(ro_):
                d = np.diff(ro_)
                return int(d.max()) if d.size else 0

            out = DeviceCSR(
                row_offsets=_put(ro),
                nbr_tiled=_put(pad_lanes_host(nbr)),
                eid_tiled=_put(pad_lanes_host(eids)),
                off_pairs=_put(_off_pairs(ro)),
                n_edges=int(nbr.shape[0]),
                max_degree=_maxdeg(ro),
                nbr_sorted_tiled=None if minimal else _tile(nbr_s),
                eid_sorted_tiled=None if minimal else _tile(eid_s),
                cumw_tiled=None if minimal else _tile(cumw),
                cumind_tiled=None if minimal else _tile(cumind),
                ts_tiled=_tile(None if nts is None
                               else nts.astype(np.int32)))
            inc = None
            if not minimal:
                ro_i, nbr_i, eids_i, nbr_si, eid_si, cumw_i, cumind_i, \
                    nts_i = _build_csr(
                        self.dst, src32, self.num_dst_nodes,
                        self._sort_key, self._sort_desc, self.weights,
                        self.out_degrees, self.timestamps)
                inc = DeviceCSR(
                    row_offsets=_put(ro_i),
                    nbr_tiled=_put(pad_lanes_host(nbr_i)),
                    eid_tiled=_put(pad_lanes_host(eids_i)),
                    off_pairs=_put(_off_pairs(ro_i)),
                    n_edges=int(nbr_i.shape[0]),
                    max_degree=_maxdeg(ro_i),
                    nbr_sorted_tiled=_tile(nbr_si),
                    eid_sorted_tiled=_tile(eid_si),
                    cumw_tiled=_tile(cumw_i),
                    cumind_tiled=_tile(cumind_i),
                    ts_tiled=_tile(None if nts_i is None
                                   else nts_i.astype(np.int32)))

            def _pool(ids32, degs):
                uniq = np.unique(ids32)
                d = degs[uniq].astype(np.float64)
                tot = d.sum()
                cdf = np.cumsum(d / (tot if tot > 0 else 1.0)).astype(np.float32)
                return _put(uniq.astype(np.int32)), _put(cdf)

            if minimal:
                u_dst = u_dst_cdf = u_src = u_src_cdf = None
            else:
                u_dst, u_dst_cdf = _pool(dst32, self.in_degrees)
                u_src, u_src_cdf = _pool(src32, self.out_degrees)
            self._device[pk] = DeviceEdgeTable(
                out=out, inc=inc, src=_put(src32), dst=_put(dst32),
                unique_dst=u_dst, unique_dst_indeg_cdf=u_dst_cdf,
                unique_src=u_src, unique_src_outdeg_cdf=u_src_cdf,
                int_attrs=_opt_put(self.int_attrs),
                float_attrs=_opt_put(self.float_attrs),
                multival_attrs=_opt_put(self.multival_attrs),
                multival_lens=_opt_put(self.multival_lens),
                weights=_opt_put(self.weights),
                labels=_opt_put(self.labels),
                timestamps=_opt_put(self.timestamps))
        return self._device[pk]


@dataclasses.dataclass
class NodeSet:
    """Seed set for traversal: dense indices into a base node table.

    Masked splits (MASK*type) resolve here — their ids map into the base
    table so attribute lookups hit the base payload (parity with the
    reference where ``set_path`` keeps the raw type for lookups,
    python/graph.py:588).
    """

    type_name: str  # possibly masked name
    base_type: str  # raw node type
    indices: np.ndarray  # [M] int32
    weights: Optional[np.ndarray] = None
    _device: Dict[str, DeviceNodeSet] = dataclasses.field(
        default_factory=dict)

    @property
    def size(self) -> int:
        return self.indices.size

    def device(self) -> DeviceNodeSet:
        pk = _placement_key()
        if pk not in self._device:
            self._device[pk] = DeviceNodeSet(
                indices=_put(self.indices.astype(np.int32)),
                weights=_opt_put(self.weights))
        return self._device[pk]


class GraphStore:
    """type registry: node_type -> NodeTable, edge_type -> EdgeTable.

    Reference equivalent: GraphStore singleton (core/graph/graph_store.h:33-66)
    minus the RPC plumbing; "remote" storage is subsumed by device sharding
    (see parallel/partition.py).
    """

    def __init__(self):
        self.nodes: Dict[str, NodeTable] = {}
        self.edges: Dict[str, EdgeTable] = {}
        self.node_sets: Dict[str, NodeSet] = {}
        # edge_type -> (src_type, dst_type); reference data/topology.py
        self.topology: Dict[str, Tuple[str, str]] = {}

    # --- registration -------------------------------------------------
    def add_node_table(self, table: NodeTable):
        self.nodes[table.type_name] = table
        # the whole table is also its own traversal set
        self.node_sets[table.type_name] = NodeSet(
            type_name=table.type_name, base_type=table.type_name,
            indices=np.arange(table.num_nodes, dtype=np.int32),
            weights=table.weights)

    def add_edge_table(self, table: EdgeTable):
        self.edges[table.type_name] = table
        self.topology[table.type_name] = (table.src_type, table.dst_type)
        # derived V(edge, node_from=EDGE_SRC/EDGE_DST) seed sets are
        # snapshots of this table's endpoints — rebuild on next use
        for nm in ("ESRC*" + table.type_name, "EDST*" + table.type_name):
            self.node_sets.pop(nm, None)

    def add_node_set(self, ns: NodeSet):
        self.node_sets[ns.type_name] = ns

    # --- accessors ----------------------------------------------------
    def node_table(self, t: str) -> NodeTable:
        if t not in self.nodes:
            raise NotFoundError("unknown node type %r" % t)
        return self.nodes[t]

    def edge_table(self, t: str) -> EdgeTable:
        if t not in self.edges:
            raise NotFoundError("unknown edge type %r" % t)
        return self.edges[t]

    def node_set(self, t: str) -> NodeSet:
        if t not in self.node_sets:
            raise NotFoundError("unknown node set %r" % t)
        return self.node_sets[t]

    def stats(self) -> Dict[str, Dict[str, int]]:
        """Per-type counts (reference GetStats op, stats_getter.cc:24)."""
        return {
            "nodes": {t: tb.num_nodes for t, tb in self.nodes.items()},
            "edges": {t: tb.num_edges for t, tb in self.edges.items()},
        }


def unify_ts_bases(store: "GraphStore") -> None:
    """Rebase every timestamped edge table to ONE global (base, scale).

    Cross-type temporal traversal and TemporalGraph spans compare
    timestamps across tables, so all tables must share a time domain.
    Called after EVERY table (re)build — Graph.init, online updates, TTL
    eviction — because EdgeTable.__init__ rebases to its own min.

    Device arrays are int32: if the global span exceeds int31, all
    timestamps are coarsened by the smallest power-of-10 scale that fits
    (a loud warning is emitted; strict before-t comparisons then hold at
    the coarsened resolution).
    """
    tables = [t for t in store.edges.values()
              if t.timestamps is not None and t.timestamps.size]
    if not tables:
        return
    lo = min(int(t.timestamps.min()) * t.ts_scale + t.ts_base
             for t in tables)
    hi = max(int(t.timestamps.max()) * t.ts_scale + t.ts_base
             for t in tables)
    span = hi - lo
    scale = 1
    while span // scale > 2**31 - 2:
        scale *= 10
    if scale > 1:
        import warnings
        warnings.warn(
            "global timestamp span %d exceeds int32; coarsening device "
            "timestamps by %dx (before-t sampling is exact at that "
            "resolution)" % (span, scale))
    for t in tables:
        if t.ts_base == lo and t.ts_scale == scale:
            continue
        absolute = t.timestamps.astype(np.int64) * t.ts_scale + t.ts_base
        t.timestamps = (absolute - lo) // scale
        t.ts_base = lo
        t.ts_scale = scale
        t._device = {}
