"""Graph facade: schema registration, load, GSL entry points.

Parity with the reference Graph API
(reference: graphlearn/python/graph.py:38-1119): ``node()``/``edge()``
register sources, ``init()`` loads and builds the store, ``V()``/``E()``
start GSL queries, plus direct lookup/degree/stats APIs.

TPU redesign: ``init()`` builds host CSR + feature tables and places them in
device HBM (single chip) or sharded over a mesh axis (see parallel/); there
are no graph servers — deployment modes collapse to process-local build +
jax.distributed for multi-host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core import ingest
from graph_learn_tpu.core.schema import Decoder, Mask, mask_type
from graph_learn_tpu.core.store import (EdgeTable, GraphStore, NodeSet,
                                        NodeTable)
from graph_learn_tpu.errors import InvalidArgumentError, NotFoundError


class _NodeSource:
    def __init__(self, path, node_type, decoder, mask):
        self.path = path
        self.node_type = node_type  # raw type
        self.decoder = decoder
        self.mask = mask


class _EdgeSource:
    def __init__(self, path, src_type, dst_type, edge_type, decoder,
                 reversed_=False):
        self.path = path
        self.src_type = src_type
        self.dst_type = dst_type
        self.edge_type = edge_type
        self.decoder = decoder
        self.reversed = reversed_


class Graph:
    def __init__(self):
        self._node_sources: List[_NodeSource] = []
        self._edge_sources: List[_EdgeSource] = []
        self._node_decoders: Dict[str, Decoder] = {}
        self._edge_decoders: Dict[str, Decoder] = {}
        self._undirected_edges: List[str] = []
        self.store = GraphStore()
        self._initialized = False

    # --- schema registration (reference graph.py:200-335) -------------
    def node(self, source: str, node_type: str, decoder: Decoder,
             mask: Union[Mask, str, None] = Mask.NONE) -> "Graph":
        if not isinstance(decoder, Decoder):
            raise InvalidArgumentError("decoder must be a Decoder")
        mask = Mask[mask.upper()] if isinstance(mask, str) else (mask or Mask.NONE)
        typed = mask_type(node_type, mask)
        self._node_decoders[typed] = decoder
        for src in [s.strip() for s in source.split(",")]:
            self._node_sources.append(_NodeSource(src, node_type, decoder, mask))
        return self

    def edge(self, source: str,
             edge_type: Tuple[str, str, str],
             decoder: Optional[Decoder] = None,
             directed: bool = True) -> "Graph":
        if not (isinstance(edge_type, tuple) and len(edge_type) == 3):
            raise InvalidArgumentError(
                "edge_type must be (src_type, dst_type, edge_type)")
        decoder = decoder or Decoder()
        src_t, dst_t, e_t = edge_type
        self._edge_decoders[e_t] = decoder
        for src in [s.strip() for s in source.split(",")]:
            self._edge_sources.append(
                _EdgeSource(src, src_t, dst_t, e_t, decoder))
        if not directed:
            # reference add_reverse_edges (graph.py:357-381): bipartite gets
            # an "<edge>_reverse" type; homogeneous loads a swapped copy
            # into the same type.
            self._undirected_edges.append(e_t)
            if src_t != dst_t:
                rev_t = e_t + "_reverse"
                self._edge_decoders[rev_t] = decoder
                for src in [s.strip() for s in source.split(",")]:
                    self._edge_sources.append(
                        _EdgeSource(src, dst_t, src_t, rev_t, decoder,
                                    reversed_=True))
            else:
                for src in [s.strip() for s in source.split(",")]:
                    self._edge_sources.append(
                        _EdgeSource(src, src_t, dst_t, e_t, decoder,
                                    reversed_=True))
        return self

    # --- build --------------------------------------------------------
    def init(self, **kwargs) -> "Graph":
        """Load all sources and build host CSR + device tables.

        Replaces the reference's server boot + coordinator barriers
        (server_impl.cc:30-150); in a multi-process setting the caller runs
        jax.distributed.initialize() first and every process loads its shard
        (see parallel/partition.py).
        """
        if self._initialized:
            return self
        # 1. base node tables (mask == NONE)
        for ns in self._node_sources:
            if ns.mask == Mask.NONE:
                cols = ingest.load_node_table(ns.path, ns.decoder)
                self._add_or_extend_node(ns.node_type, ns.decoder, cols)
        # 2. masked seed sets (resolve ids into base tables)
        for ns in self._node_sources:
            if ns.mask != Mask.NONE:
                cols = ingest.load_node_table(ns.path, ns.decoder)
                typed = mask_type(ns.node_type, ns.mask)
                base = self.store.node_table(ns.node_type)
                idx = base.index.lookup(cols["ids"])
                self.store.add_node_set(NodeSet(
                    type_name=typed, base_type=ns.node_type,
                    indices=idx, weights=cols["weights"]))
        # 3. edges
        grouped: Dict[str, List[_EdgeSource]] = {}
        for es in self._edge_sources:
            grouped.setdefault(es.edge_type, []).append(es)
        for e_t, sources in grouped.items():
            self._load_edge_type(e_t, sources)
        # 3b. optional locality relabeling (core/reorder.py): BFS/CM order
        # so neighbor feature rows share HBM tiles on device gathers
        reorder = kwargs.get("reorder")
        if reorder:
            from graph_learn_tpu.core.reorder import reorder_store
            reorder_store(self.store, reorder)
        # 4. unify timestamp bases across edge tables: each table rebases
        # to its own min at build; cross-type temporal traversal (e.g. TGAT
        # events from one table, neighbor hops over another) compares
        # timestamps across tables, so shift everything to the global base.
        from graph_learn_tpu.core.store import unify_ts_bases
        unify_ts_bases(self.store)
        self._initialized = True
        return self

    def _add_or_extend_node(self, node_type: str, decoder: Decoder, cols):
        """Create the node table, or MERGE an additional source into it.

        Parity: the reference concatenates multiple sources registered for
        one node type — comma-separated paths or repeated g.node() calls
        (reference python/graph.py:200-242 appends to node_sources and the
        loaders union the rows).  Duplicate ids across sources raise (the
        store's IdIndex enforces uniqueness).
        """
        fields = ("int_attrs", "float_attrs", "multival_attrs",
                  "multival_lens", "weights", "labels", "timestamps")
        if node_type in self.store.nodes:
            old = self.store.nodes[node_type]
            merged = {"ids": np.concatenate([old.raw_ids, cols["ids"]])}
            for f in fields:
                a = getattr(old, f)
                b = cols[f]
                if (a is None) != (b is None):
                    raise InvalidArgumentError(
                        "source schemas for node type %r disagree on %s "
                        "(all sources of one type must share the decoder "
                        "layout)" % (node_type, f))
                merged[f] = None if a is None else np.concatenate([a, b])
            cols = merged
        table = NodeTable(
            node_type, decoder, cols["ids"],
            int_attrs=cols["int_attrs"], float_attrs=cols["float_attrs"],
            multival_attrs=cols["multival_attrs"],
            multival_lens=cols["multival_lens"],
            weights=cols["weights"], labels=cols["labels"],
            timestamps=cols["timestamps"])
        self.store.add_node_table(table)

    def _load_edge_type(self, e_t: str, sources: List[_EdgeSource]):
        first = sources[0]
        decoder = first.decoder
        src_parts, dst_parts = [], []
        payload: Dict[str, List[np.ndarray]] = {}
        for es in sources:
            cols = ingest.load_edge_table(es.path, es.decoder)
            s_ids, d_ids = cols["src_ids"], cols["dst_ids"]
            if es.reversed:
                s_ids, d_ids = d_ids, s_ids
            src_parts.append(s_ids)
            dst_parts.append(d_ids)
            for k in ("weights", "labels", "timestamps", "int_attrs",
                      "float_attrs", "multival_attrs", "multival_lens"):
                if cols[k] is not None:
                    payload.setdefault(k, []).append(cols[k])
        raw_src = np.concatenate(src_parts)
        raw_dst = np.concatenate(dst_parts)
        merged = {k: np.concatenate(v) for k, v in payload.items()}
        src_table = self.store.node_table(first.src_type)
        dst_table = self.store.node_table(first.dst_type)
        src_idx = src_table.index.lookup(raw_src)
        dst_idx = dst_table.index.lookup(raw_dst)
        table = EdgeTable(
            e_t, first.src_type, first.dst_type, decoder,
            src=src_idx, dst=dst_idx,
            num_src_nodes=src_table.num_nodes,
            num_dst_nodes=dst_table.num_nodes,
            weights=merged.get("weights"), labels=merged.get("labels"),
            timestamps=merged.get("timestamps"),
            int_attrs=merged.get("int_attrs"),
            float_attrs=merged.get("float_attrs"),
            multival_attrs=merged.get("multival_attrs"),
            multival_lens=merged.get("multival_lens"))
        self.store.add_edge_table(table)

    def close(self):
        self.store = GraphStore()
        self._initialized = False

    # --- snapshot/restore (reference: DGS checkpoint.py:44-197) --------
    def save(self, path: str) -> "Graph":
        """Snapshot the BUILT store to ``path/`` — restart restores it
        with :meth:`load` without touching the source TSVs."""
        if not self._initialized:
            raise InvalidArgumentError("save() requires an initialized graph")
        from graph_learn_tpu.core.snapshot import save_store
        save_store(self.store, path)
        return self

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "Graph":
        """Cold-start from a :meth:`save` snapshot (IO-bound: arrays are
        memory-mapped; no TSV parse, no id remap)."""
        from graph_learn_tpu.core.snapshot import load_store
        g = cls()
        g.store = load_store(path, mmap=mmap)
        for t, nt in g.store.nodes.items():
            g._node_decoders[t] = nt.decoder
        for t, et in g.store.edges.items():
            g._edge_decoders[t] = et.decoder
        g._initialized = True
        return g

    # --- decoders / topology ------------------------------------------
    def get_node_decoder(self, node_type: str) -> Decoder:
        return self._node_decoders.get(node_type, Decoder())

    def get_edge_decoder(self, edge_type: str) -> Decoder:
        return self._edge_decoders.get(edge_type, Decoder())

    def topology(self) -> Dict[str, Tuple[str, str]]:
        return dict(self.store.topology)

    # --- direct (non-GSL) APIs ----------------------------------------
    def get_stats(self) -> Dict[str, Dict[str, int]]:
        return self.store.stats()

    def out_degrees(self, node_ids: np.ndarray, edge_type: str) -> np.ndarray:
        """Parity: reference degree getter (graph.py:1098-1116)."""
        et = self.store.edge_table(edge_type)
        idx = self.store.node_table(et.src_type).index.lookup(
            np.asarray(node_ids, np.int64))
        return et.out_degrees[idx]

    def in_degrees(self, node_ids: np.ndarray, edge_type: str) -> np.ndarray:
        et = self.store.edge_table(edge_type)
        idx = self.store.node_table(et.dst_type).index.lookup(
            np.asarray(node_ids, np.int64))
        return et.in_degrees[idx]

    def lookup_nodes(self, node_type: str, ids: np.ndarray):
        """Attributes of the given raw node ids (reference graph.py:979)."""
        from graph_learn_tpu.ops.lookup import lookup_nodes as _ln
        t = self.store.node_table(node_type)
        idx = t.index.lookup(np.asarray(ids, np.int64))
        import jax.numpy as jnp
        return _ln(t.device(), jnp.asarray(idx), type_name=node_type)

    def lookup_edges(self, edge_type: str, edge_ids: np.ndarray):
        """Attributes of the given edge row indices (graph.py:1013)."""
        from graph_learn_tpu.ops.lookup import edge_payload
        import jax.numpy as jnp
        et = self.store.edge_table(edge_type)
        return edge_payload(et.device(), jnp.asarray(edge_ids, jnp.int32))

    # --- KNN (reference contrib/knn; graph.py:1054-1057) --------------
    def search(self, node_type: str, inputs: np.ndarray, option, mesh=None):
        """k-NN over a node type's float attrs (reference Graph.search,
        graph.py:1054-1057).  With ``mesh`` (a mesh with a "graph" axis)
        the per-point arrays are range-partitioned over that axis and
        each device searches its shard with a merged top-k — the
        RemoteOperator fan-out of the reference KnnOperator
        (knn_op.h:27-40) as one SPMD program; results are exactly equal
        to the single-device search."""
        from graph_learn_tpu.ops import knn as knn_ops
        sharded = mesh is not None and mesh.shape.get("graph", 1) > 1
        key = (node_type, option.index_type, sharded)
        if not hasattr(self, "_knn_indexes"):
            self._knn_indexes = {}
        if key not in self._knn_indexes:
            t = self.store.node_table(node_type)
            if t.float_attrs is None:
                raise InvalidArgumentError(
                    "node type %r has no float attrs for KNN" % node_type)
            index = knn_ops.build_index(t.float_attrs, t.raw_ids, option)
            if sharded:
                index = knn_ops.shard_index(index, mesh)
            self._knn_indexes[key] = index
        return self._knn_indexes[key].search(np.asarray(inputs, np.float32),
                                             option.k)

    # --- GSL entry points (defined in gsl/query.py; attached lazily to
    # avoid an import cycle) -------------------------------------------
    def V(self, t: str, node_from=None, mask: Union[Mask, str, None] = Mask.NONE):
        from graph_learn_tpu.gsl.query import v_entry
        return v_entry(self, t, node_from=node_from, mask=mask)

    def E(self, edge_type: str):
        from graph_learn_tpu.gsl.query import e_entry
        return e_entry(self, edge_type)
