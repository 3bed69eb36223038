"""GSL query -> one jitted device plan.

Replaces the reference's server-side DAG machinery: DagDef proto compile
(core/dag/dag.cc), per-round Tape recording (core/dag/tape.h:36-120), the
ThreadDagScheduler producer loop (core/runner/dag_scheduler.cc:27-104) and
the partition/stitch RPC fan-out (core/runner/op_runner.h:60-152) all
collapse into a single jitted function: seeds go in, every aliased hop's
gathered payload comes out.  XLA fuses the lookups; there is no
serialisation boundary anywhere in the sampled-data path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import edge_field
from graph_learn_tpu.core.values import Edges, Nodes, SparseNodes, SubGraphVal
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.gsl.dag import Dag, DagNode
from graph_learn_tpu.ops import negative as neg_ops
from graph_learn_tpu.ops import sampling as samp_ops
from graph_learn_tpu.ops import subgraph as sg_ops
from graph_learn_tpu.ops import temporal as temporal_ops
from graph_learn_tpu.ops import walk as walk_ops
from graph_learn_tpu.ops.lookup import (edge_payload, lookup_nodes,
                                        lookup_sparse_nodes)


class _Rec:
    """Per-node execution record inside the plan."""

    __slots__ = ("ids", "edge_ids", "degrees", "node_type", "value", "ts")

    def __init__(self, ids=None, edge_ids=None, degrees=None, node_type=None,
                 value=None, ts=None):
        self.ids = ids
        self.edge_ids = edge_ids
        self.degrees = degrees
        self.node_type = node_type
        self.value = value
        self.ts = ts  # per-element timestamps (temporal traversal bound)


class Query:
    """A finished GSL query: compiles and runs the device plan.

    Reference equivalent: the DagDef installed by Dataset
    (gsl/dag_dataset.py:49-55) — but compiled locally to a jitted fn.
    """

    def __init__(self, dag: Dag, post_func=None):
        self.dag = dag
        self.graph = dag.graph
        self.post_func = post_func
        src = dag.nodes[0]
        if src.kind not in ("source_v", "source_e"):
            raise InvalidArgumentError("query must start at V()/E()")
        self.source = src
        self._plan = None

    # --- source spec for the Dataset ----------------------------------
    def source_space(self):
        """(size, kind) of the seed space."""
        if self.source.kind == "source_v":
            ns = self.graph.store.node_set(self.source.node_type)
            return ns.size, "node"
        et = self.graph.store.edge_table(self.source.edge_type)
        return et.num_edges, "edge"

    def device_tables(self):
        """Collect the device tables the plan needs (pytree jit arg)."""
        store = self.graph.store
        node_types, edge_types = set(), set()
        for n in self.dag.nodes:
            if n.edge_type:
                edge_types.add(n.edge_type)
                s, d = store.topology[n.edge_type]
                node_types.update((s, d))
            if n.node_type:
                ns = store.node_sets.get(n.node_type)
                node_types.add(ns.base_type if ns else n.node_type)
        out = {
            "nodes": {t: store.node_table(t).device() for t in node_types},
            "edges": {t: store.edge_table(t).device() for t in edge_types},
            "cond": build_condition_tables(self),
        }
        return out

    # --- compile ------------------------------------------------------
    def build(self) -> Callable:
        """Returns jitted plan_fn(tables, seeds, key) -> {alias: value}."""
        if self._plan is None:
            self._plan = jax.jit(partial(_execute, self))
        return self._plan

    def run(self, seeds: jax.Array, key: jax.Array):
        tables = self.device_tables()
        return self.build()(tables, seeds, key)


def build_condition_tables(query: "Query"):
    """{dag nid: ConditionTable} for every .where() conditional node.

    Shared by Query.device_tables (replicated single-device store) and
    parallel/sharded_store.build_sharded_tables — the condition tables are
    id-sized (value-sorted runs + CDFs) and stay REPLICATED on a sharded
    store (reference: condition_table.h:57-99 per-server tables).
    """
    from graph_learn_tpu.ops.conditional import ConditionTable

    store = query.graph.store
    out = {}
    for n in query.dag.nodes:
        if n.strategy != "conditional":
            continue
        s_t, d_t = store.topology[n.edge_type]
        result_t = s_t if n.kind == "in_neg" else d_t
        nt = store.node_table(result_t)
        et = store.edge_table(n.edge_type)
        cond = n.condition or {}
        # str cols are hashed int columns in this store: merge them
        int_cols = list(cond.get("int_cols", [])) + \
            list(cond.get("str_cols", []))
        float_cols = list(cond.get("float_cols", []))
        if n.base_strategy == "in_degree":
            w = (et.out_degrees if n.kind == "in_neg"
                 else et.in_degrees).astype(np.float64)
        elif n.base_strategy == "node_weight":
            w = nt.weights
        else:
            w = None
        out[str(n.nid)] = ConditionTable.build(nt, int_cols, float_cols, w)
    return out


def _node_types_of_edge(query: Query, edge_type: str):
    return query.graph.store.topology[edge_type]


def _base_type(query: Query, node_type: str):
    ns = query.graph.store.node_sets.get(node_type)
    return ns.base_type if ns is not None else node_type


def _flat(ids: jax.Array):
    return ids.reshape(-1), ids.shape


def _execute(query: Query, tables, seeds: jax.Array, key: jax.Array):
    store_topology = query.graph.store.topology
    recs: Dict[int, _Rec] = {}
    out: Dict[str, object] = {}
    keys = jax.random.split(key, max(len(query.dag.nodes), 1))

    for node in query.dag.nodes:
        k = keys[node.nid % len(keys)]
        rec = _exec_node(query, tables, node, recs, seeds, k)
        recs[node.nid] = rec

    for alias, node in query.dag.aliased_nodes.items():
        out[alias] = recs[node.nid].value
    return out


def _exec_node(query: Query, tables, node: DagNode, recs, seeds, key) -> _Rec:
    kind = node.kind
    if kind == "source_v":
        base = _base_type(query, node.node_type)
        nt = tables["nodes"][base]
        ids = seeds.astype(jnp.int32)
        val = lookup_nodes(nt, ids, type_name=node.node_type)
        return _Rec(ids=ids, node_type=base, value=val)

    if kind == "source_e":
        et = tables["edges"][node.edge_type]
        s_t, d_t = _node_types_of_edge(query, node.edge_type)
        eidx = seeds.astype(jnp.int32)
        src_ids = edge_field(et, "src", eidx)
        dst_ids = edge_field(et, "dst", eidx)
        pay = edge_payload(et, eidx)
        val = Edges(
            edge_ids=eidx,
            src_nodes=lookup_nodes(tables["nodes"][s_t], src_ids, type_name=s_t),
            dst_nodes=lookup_nodes(tables["nodes"][d_t], dst_ids, type_name=d_t),
            weights=pay["weights"], labels=pay["labels"],
            timestamps=pay["timestamps"], int_attrs=pay["int_attrs"],
            float_attrs=pay["float_attrs"],
            multival_attrs=pay["multival_attrs"],
            multival_lens=pay["multival_lens"], type_name=node.edge_type)
        rec = _Rec(ids=src_ids, edge_ids=eidx, node_type=s_t, value=val,
                   ts=pay["timestamps"])
        return rec

    parent = recs[node.parent.nid]

    if kind in ("endpoint_src", "endpoint_dst"):
        ev: Edges = parent.value
        nv = ev.src_nodes if kind == "endpoint_src" else ev.dst_nodes
        return _Rec(ids=nv.ids, node_type=nv.type_name, value=nv,
                    ts=parent.ts)

    if kind in ("out_v", "in_v", "out_e", "in_e"):
        return _exec_hop(query, tables, node, parent, recs, key)

    if kind in ("out_neg", "in_neg"):
        return _exec_neg(query, tables, node, parent, recs, key)

    if kind == "walk":
        et = tables["edges"][node.edge_type]
        s_t, d_t = _node_types_of_edge(query, node.edge_type)
        flat, shape = _flat(parent.ids)
        walks = walk_ops.node2vec_walk(et.out, flat, node.walk_len, key,
                                       p=node.walk_p, q=node.walk_q)
        walks = walks.reshape(shape + (node.walk_len,))
        nt = tables["nodes"][d_t]
        val = lookup_nodes(nt, jnp.maximum(walks, 0), type_name=d_t)
        val = val.replace(ids=walks)  # keep -1 sentinels visible
        return _Rec(ids=walks, node_type=d_t, value=val)

    if kind == "subgraph":
        # runs on plain AND graph-axis-sharded stores: the full-neighbor
        # candidate pass inside induce_subgraph is a row-sharded op
        # (ops/subgraph._full_candidates), everything downstream is
        # id-sized and replicated — same distribution shape as the
        # reference's SubGraphSampler over the partitioned GraphStore
        # (subgraph_sampler.cc:27-80)
        et = tables["edges"][node.edge_type]
        s_t, d_t = _node_types_of_edge(query, node.edge_type)
        flat, _ = _flat(parent.ids)
        sg = sg_ops.induce_subgraph(et.out, flat, nbr_cap=node.nbr_cap,
                                    need_dist=node.need_dist)
        nt = tables["nodes"][s_t]
        nodes_val = lookup_nodes(
            nt, jnp.where(sg.node_ids < jnp.int32(2**31 - 1), sg.node_ids, 0),
            type_name=s_t)
        sg = sg.replace(nodes=nodes_val, type_name=node.edge_type)
        return _Rec(ids=sg.node_ids, node_type=s_t, value=sg)

    raise InvalidArgumentError("unknown dag node kind %r" % kind)


def _exec_hop(query: Query, tables, node: DagNode, parent: _Rec, recs, key):
    et = tables["edges"][node.edge_type]
    s_t, d_t = _node_types_of_edge(query, node.edge_type)
    incoming = node.kind in ("in_v", "in_e")
    csr = et.inc if incoming else et.out
    result_type = s_t if incoming else d_t
    flat, shape = _flat(parent.ids)

    # populate the parent's degrees w.r.t. the hopped edge type (parity
    # with the reference's auto-inserted DegreeDagNode per traversal,
    # gsl/dag_node.py:71-79): Nodes.out_degrees on dense hops.
    from graph_learn_tpu.core.sharding import csr_degrees
    pv = parent.value
    if isinstance(pv, Nodes) and pv.out_degrees is None:
        parent.value = pv.replace(
            out_degrees=csr_degrees(csr, flat).reshape(shape))
    k = node.count
    strategy = node.strategy

    flt = None
    if node.filter_alias is not None:
        # reject samples equal to the target's per-row ids
        # (reference FilterType.EQUAL on FilterField.ID, dag_node.py:212-231;
        # applied inside EVERY sampler via Filter::ActOn, sampler/filter.cc)
        target = query.dag.get_node(node.filter_alias)
        tgt_flat, _ = _flat(recs[target.nid].ids)
        flt = samp_ops.SampleFilter(exclude_dst=tgt_flat)

    # temporal traversal: when the seed path carries timestamps and this
    # edge type is timestamped, neighbors are restricted to edges strictly
    # before the seed's time (reference auto-injected ts filters,
    # gsl/dag_node.py:357-364) — exact prefix sampling, ops/temporal.py.
    t_upper = None
    if parent.ts is not None and csr.nbr_ts is not None:
        t_upper, _ = _flat(parent.ts)

    if strategy == "full":
        cap = k if k > 0 else conf.default_full_nbr_num
        if t_upper is not None:
            ids, eids, degs = temporal_ops.temporal_full_sample(
                csr, flat, cap, t_upper, flt=flt)
        else:
            ids, eids, degs = samp_ops.full_sample(csr, flat, cap, flt=flt)
        nt = tables["nodes"][result_type]
        val = lookup_sparse_nodes(nt, ids, degs, type_name=result_type)
        new_ts = (edge_field(et, "timestamps", eids)
                  if t_upper is not None else None)
        return _Rec(ids=ids.reshape(shape + (cap,)), edge_ids=eids,
                    degrees=degs, node_type=result_type, value=val,
                    ts=new_ts)

    if t_upper is not None:
        if strategy == "random":
            ids, eids = temporal_ops.temporal_uniform_sample(
                csr, flat, k, key, t_upper, flt=flt)
        elif strategy in ("edge_weight", "in_degree"):
            ids, eids = temporal_ops.temporal_weighted_sample(
                csr, flat, k, key, t_upper, by=strategy, flt=flt)
        elif strategy == "random_without_replacement":
            ids, eids = temporal_ops.temporal_without_replacement_sample(
                csr, flat, k, key, t_upper, flt=flt)
        elif strategy == "topk":
            ids, eids = temporal_ops.temporal_topk_sample(csr, flat, k,
                                                          t_upper, flt=flt)
        elif strategy in samp_ops.STRATEGY_FNS:
            # user-registered strategy on a temporal path: the fn must
            # opt in to the before-t bound (no silent temporal leakage)
            import inspect
            fn = samp_ops.STRATEGY_FNS[strategy]
            if "t_upper" in inspect.signature(fn).parameters:
                ids, eids = fn(csr, flat, k, key, t_upper=t_upper)
            else:
                raise InvalidArgumentError(
                    "custom strategy %r does not accept t_upper and the "
                    "seed path is temporal; add a t_upper kwarg to the "
                    "registered sampler" % strategy)
        else:
            raise InvalidArgumentError("unknown strategy %r" % strategy)
    elif strategy == "random":
        ids, eids = samp_ops.uniform_sample(csr, flat, k, key, flt=flt)
    elif strategy == "topk":
        ids, eids = samp_ops.topk_sample(csr, flat, k, flt=flt)
    elif strategy in ("edge_weight", "in_degree"):
        ids, eids = samp_ops.weighted_sample(csr, flat, k, key, by=strategy,
                                             flt=flt)
    elif strategy == "random_without_replacement":
        ids, eids = samp_ops.without_replacement_sample(csr, flat, k, key,
                                                        flt=flt)
    elif strategy in samp_ops.STRATEGY_FNS:
        # user-registered strategy (register_sampler extension point)
        ids, eids = samp_ops.STRATEGY_FNS[strategy](csr, flat, k, key)
    else:
        raise InvalidArgumentError("unknown strategy %r" % strategy)

    ids = ids.reshape(shape + (k,))
    eids = eids.reshape(shape + (k,))
    nt = tables["nodes"][result_type]
    hop_ts = (edge_field(et, "timestamps", eids)
              if t_upper is not None else None)

    if node.kind in ("out_v", "in_v"):
        val = lookup_nodes(nt, ids, type_name=result_type)
        return _Rec(ids=ids, edge_ids=eids, node_type=result_type, value=val,
                    ts=hop_ts)

    # edge hop: Edges with replicated src view
    src_ids = jnp.broadcast_to(parent.ids[..., None], ids.shape)
    pay = edge_payload(et, eids)
    src_type = d_t if incoming else s_t
    val = Edges(
        edge_ids=eids,
        src_nodes=lookup_nodes(tables["nodes"][src_type], src_ids,
                               type_name=src_type),
        dst_nodes=lookup_nodes(nt, ids, type_name=result_type),
        weights=pay["weights"], labels=pay["labels"],
        timestamps=pay["timestamps"], int_attrs=pay["int_attrs"],
        float_attrs=pay["float_attrs"], multival_attrs=pay["multival_attrs"],
        multival_lens=pay["multival_lens"], type_name=node.edge_type)
    return _Rec(ids=ids, edge_ids=eids, node_type=result_type, value=val,
                ts=pay["timestamps"] if pay["timestamps"] is not None
                else hop_ts)


def _exec_neg(query: Query, tables, node: DagNode, parent: _Rec, recs, key):
    if node.edge_type is None:
        # Neg(node_type): pool = the node set itself (dag_node.py:509-515)
        base = _base_type(query, node.node_type)
        nt = tables["nodes"][base]
        flat, shape = _flat(parent.ids)
        ids = neg_ops.negative_sample_from_nodes(
            nt, flat.shape[0], node.count, key, strategy=node.strategy)
        ids = ids.reshape(shape + (node.count,))
        val = lookup_nodes(nt, ids, type_name=base)
        return _Rec(ids=ids, node_type=base, value=val)

    et = tables["edges"][node.edge_type]
    s_t, d_t = _node_types_of_edge(query, node.edge_type)
    reverse = node.kind == "in_neg"
    result_type = s_t if reverse else d_t
    flat, shape = _flat(parent.ids)
    dst_table = tables["nodes"].get(result_type)
    if node.strategy == "conditional":
        ids = _exec_conditional_neg(query, tables, node, recs, flat, et,
                                    dst_table, key)
    else:
        ids = neg_ops.negative_sample(et, flat, node.count, key,
                                      strategy=node.strategy,
                                      dst_table=dst_table, reverse=reverse)
    ids = ids.reshape(shape + (node.count,))
    val = lookup_nodes(tables["nodes"][result_type], ids,
                       type_name=result_type)
    # negatives inherit the seed's time: downstream hops from a negative
    # tower stay bounded by the event (reference TGAT neg tower samples
    # strictly-before-event neighbors, train_eval.py:58-78)
    neg_ts = (jnp.broadcast_to(parent.ts[..., None], ids.shape)
              if parent.ts is not None else None)
    return _Rec(ids=ids, node_type=result_type, value=val, ts=neg_ts)


def _exec_conditional_neg(query: Query, tables, node: DagNode, recs, flat,
                          et, dst_table, key):
    """.where(target, condition) negatives (conditional_negative_sampler.cc)."""
    from graph_learn_tpu.core.sharding import (ShardedNodeTable,
                                               sharded_row_gather)
    from graph_learn_tpu.ops.conditional import conditional_negative_sample
    from graph_learn_tpu.ops.negative import _draw_cdf_ids, _draw_uniform_ids

    cond = node.condition or {}
    target = query.dag.get_node(node.filter_alias)
    pos_dst, _ = _flat(recs[target.nid].ids)
    ct = tables["cond"][str(node.nid)]
    reverse = node.kind == "in_neg"
    pool = et.unique_src if reverse else et.unique_dst
    pool_cdf = (et.unique_src_outdeg_cdf if reverse
                else et.unique_dst_indeg_cdf)
    if pool is None:
        from graph_learn_tpu.errors import InvalidArgumentError
        raise InvalidArgumentError(
            "conditional negative sampling needs the candidate-pool and "
            "membership tables, which storage_profile='minimal' drops — "
            "use the default profile for queries with .where()")

    if node.base_strategy == "in_degree":
        base_draw = lambda k_, shape: _draw_cdf_ids(pool, pool_cdf, k_, shape)
    elif node.base_strategy == "node_weight":
        all_ids = jnp.arange(dst_table.num_nodes, dtype=jnp.int32)
        base_draw = lambda k_, shape: _draw_cdf_ids(
            all_ids, dst_table.cum_weights, k_, shape)
    else:
        base_draw = lambda k_, shape: _draw_uniform_ids(pool, k_, shape)

    # positive dst attributes for the matching columns.  On a sharded
    # store the ConditionTable stays REPLICATED (id-sized runs/CDFs) and
    # only this [b, n_cols] attribute probe crosses the axis (one psum) —
    # the reference likewise runs ConditionalNegativeSampler against
    # sharded storage with a replicated condition table
    # (conditional_negative_sampler.cc:37-110).
    if isinstance(dst_table, ShardedNodeTable):
        rps = dst_table.rows_per_shard
        pia = sharded_row_gather(dst_table.local.int_attrs, rps,
                                 dst_table.axis, pos_dst)
        pfa = sharded_row_gather(dst_table.local.float_attrs, rps,
                                 dst_table.axis, pos_dst)
    else:
        pia = (dst_table.int_attrs[pos_dst]
               if dst_table.int_attrs is not None else None)
        pfa = (dst_table.float_attrs[pos_dst]
               if dst_table.float_attrs is not None else None)
    int_cols = list(cond.get("int_cols", [])) + list(cond.get("str_cols", []))
    int_props = list(cond.get("int_props", [])) + list(cond.get("str_props", []))
    return conditional_negative_sample(
        et, ct, flat, pos_dst, pia, pfa, node.count, key,
        int_cols, int_props,
        list(cond.get("float_cols", [])), list(cond.get("float_props", [])),
        base_draw, batch_share=bool(cond.get("batch_share", False)),
        unique=bool(cond.get("unique", False)), reverse=reverse)
