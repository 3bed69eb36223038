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

from graph_learn_tpu.core.store import (DeviceCSR, DeviceEdgeTable,
                                        DeviceNodeTable)
from graph_learn_tpu.core.values import Nodes, SparseNodes


def _g(arr: Optional[jax.Array], idx: jax.Array):
    if arr is None:
        return None
    safe = jnp.clip(idx, 0, arr.shape[0] - 1)
    return arr[safe]


def lookup_nodes(table: DeviceNodeTable, ids: jax.Array,
                 type_name: str = "",
                 out_degrees: Optional[jax.Array] = None) -> Nodes:
    """ids: dense indices, any shape -> Nodes with full payload."""
    return Nodes(
        ids=ids.astype(jnp.int32),
        raw_ids=_g(table.raw_ids, ids),
        int_attrs=_g(table.int_attrs, ids),
        float_attrs=_g(table.float_attrs, ids),
        multival_attrs=_g(table.multival_attrs, ids),
        multival_lens=_g(table.multival_lens, ids),
        weights=_g(table.weights, ids),
        labels=_g(table.labels, ids),
        timestamps=_g(table.timestamps, ids),
        out_degrees=out_degrees,
        type_name=type_name)


def lookup_sparse_nodes(table: DeviceNodeTable, ids: jax.Array,
                        degrees: jax.Array, type_name: str = "") -> SparseNodes:
    return SparseNodes(
        ids=ids.astype(jnp.int32), degrees=degrees,
        raw_ids=_g(table.raw_ids, ids),
        int_attrs=_g(table.int_attrs, ids),
        float_attrs=_g(table.float_attrs, ids),
        multival_attrs=_g(table.multival_attrs, ids),
        multival_lens=_g(table.multival_lens, ids),
        weights=_g(table.weights, ids),
        labels=_g(table.labels, ids),
        timestamps=_g(table.timestamps, ids),
        type_name=type_name)


def edge_payload(et: DeviceEdgeTable, edge_ids: jax.Array):
    """Gather per-edge weight/label/ts/attrs at edge row indices (-1 = pad)."""
    valid = edge_ids >= 0
    out = {}
    for name in ("weights", "labels", "timestamps", "int_attrs",
                 "float_attrs", "multival_attrs", "multival_lens"):
        arr = getattr(et, name)
        if arr is None:
            out[name] = None
            continue
        v = _g(arr, jnp.maximum(edge_ids, 0))
        if name == "weights":
            v = jnp.where(valid if v.ndim == valid.ndim
                          else valid[..., None], v, 0)
        out[name] = v
    return out
