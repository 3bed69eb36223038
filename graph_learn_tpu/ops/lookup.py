"""Attribute lookup: gather node/edge payloads into value structs.

Parity with the reference lookup operators
(reference: graphlearn/src/core/operator/graph/node_lookuper.cc:24,
edge_lookuper.cc:24) — but fused: in the reference every GSL hop issues a
separate LookupNodes RPC (gsl/dag_node.py:558-564); here lookups are plain
device gathers inlined into the compiled query plan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_learn_tpu.core.sharding import (ShardedEdgeTable,
                                           ShardedNodeTable, defer_payload,
                                           own_rows, psum_owned)
from graph_learn_tpu.core.store import (DeviceCSR, DeviceEdgeTable,
                                        DeviceNodeTable)
from graph_learn_tpu.core.values import Nodes, SparseNodes


def _g(arr: Optional[jax.Array], idx: jax.Array):
    if arr is None:
        return None
    if arr.ndim == 2:
        # feature-row gather — the framework's hottest memory op;
        # conf.use_pallas routes it onto the row-streaming kernel
        from graph_learn_tpu.ops.pallas.dispatch import feature_gather
        return feature_gather(arr, idx)
    safe = jnp.clip(idx, 0, arr.shape[0] - 1)
    return arr[safe]


def _field_getter(table, ids: jax.Array):
    """Per-field gather closure; shard-transparent.

    On a :class:`ShardedNodeTable` each field is gathered from the local
    row block for owned ids and stitched with one psum (the device
    analogue of the reference's fanned-out LookupNodes RPC + Stitcher,
    node_lookuper.cc:24 + stitcher.h:26).
    """
    if isinstance(table, ShardedNodeTable):
        loc, own = own_rows(table.rows_per_shard, table.axis, ids)

        def g(name):
            arr = getattr(table.local, name)
            if arr is None:
                return None
            # payload vectors (ndim >= 2) take the owner-routed exchange
            # when the partitioned plan enables it — O(n*D) bytes over the
            # axis instead of the psum stitch's O(P*n*D)
            routed = defer_payload(arr, table.rows_per_shard, table.axis,
                                   ids)
            if routed is not None:
                return routed
            return psum_owned(arr[loc], own, table.axis)

        return g
    return lambda name: _g(getattr(table, name), ids)


def lookup_nodes(table: DeviceNodeTable, ids: jax.Array,
                 type_name: str = "",
                 out_degrees: Optional[jax.Array] = None) -> Nodes:
    """ids: dense indices, any shape -> Nodes with full payload."""
    g = _field_getter(table, ids)
    return Nodes(
        ids=ids.astype(jnp.int32),
        raw_ids=g("raw_ids"),
        int_attrs=g("int_attrs"),
        float_attrs=g("float_attrs"),
        multival_attrs=g("multival_attrs"),
        multival_lens=g("multival_lens"),
        weights=g("weights"),
        labels=g("labels"),
        timestamps=g("timestamps"),
        out_degrees=out_degrees,
        type_name=type_name)


def lookup_sparse_nodes(table: DeviceNodeTable, ids: jax.Array,
                        degrees: jax.Array, type_name: str = "") -> SparseNodes:
    g = _field_getter(table, ids)
    return SparseNodes(
        ids=ids.astype(jnp.int32), degrees=degrees,
        raw_ids=g("raw_ids"),
        int_attrs=g("int_attrs"),
        float_attrs=g("float_attrs"),
        multival_attrs=g("multival_attrs"),
        multival_lens=g("multival_lens"),
        weights=g("weights"),
        labels=g("labels"),
        timestamps=g("timestamps"),
        type_name=type_name)


def edge_payload(et: DeviceEdgeTable, edge_ids: jax.Array):
    """Gather per-edge weight/label/ts/attrs at edge row indices (-1 = pad)."""
    valid = edge_ids >= 0
    idx = jnp.maximum(edge_ids, 0)
    if isinstance(et, ShardedEdgeTable):
        loc, own = own_rows(et.edges_per_shard, et.axis, idx)

        def getv(arr):
            routed = defer_payload(arr, et.edges_per_shard, et.axis, idx)
            if routed is not None:
                return routed
            return psum_owned(arr[loc], own, et.axis)
    else:
        getv = lambda arr: _g(arr, idx)
    out = {}
    for name in ("weights", "labels", "timestamps", "int_attrs",
                 "float_attrs", "multival_attrs", "multival_lens"):
        arr = getattr(et, name)
        if arr is None:
            out[name] = None
            continue
        v = getv(arr)
        if name == "weights":
            v = jnp.where(valid if v.ndim == valid.ndim
                          else valid[..., None], v, 0)
        out[name] = v
    return out
