"""Device mesh + sharding rules for the graph store and training step.

TPU-native replacement for the reference's distribution machinery
(reference: hash-partitioned graph servers + gRPC fan-out/stitch,
core/partition/hash_partitioner.h:28-140, core/runner/op_runner.h:60-152;
PS-sharded embeddings, nn/tf/data/feature_column.py:83-99; PS/worker data
parallelism, examples/tf/trainer.py:327-371).

One program, one mesh:
- axis "data":  seed batches (data parallelism; reference PS/worker)
- axis "graph": graph storage rows (feature tables / CSR arrays sharded
  over devices; reference hash-partitioned servers).  XLA turns gathers
  from row-sharded tables into collective lookups over ICI — the
  partition/stitch request machinery is subsumed.

Parameters are replicated by default; embedding tables (params named
embedding_*) shard over "graph" like the reference's partitioned embedding
variables.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_graph: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_graph
    assert n_data * n_graph == n, (n_data, n_graph, n)
    arr = np.array(devices).reshape(n_data, n_graph)
    return Mesh(arr, ("data", "graph"))


def shard_tables(tables, mesh: Mesh):
    """Place device tables on the mesh.

    Node payload arrays (rows = nodes) and edge payload arrays (rows =
    edges) shard row-wise over "graph"; CSR index arrays stay replicated in
    this scheme (edge-partitioned CSR with halo exchange is the
    parallel/partition.py scheme).  Row counts rarely divide the axis size,
    so arrays that don't divide evenly are REPLICATED instead — a warning
    reports how many bytes fell back, because per-device HBM does not
    shrink for those arrays.  For true 1/P-per-device storage use the
    range-partitioned store (parallel/sharded_store.build_sharded_tables),
    which DistTrainer now selects automatically for large tables.
    """
    import warnings

    ax = mesh.shape["graph"]
    repl = NamedSharding(mesh, P())
    rowsh = NamedSharding(mesh, P("graph"))
    fell_back = [0, 0]  # bytes replicated due to non-divisible rows, count

    def place(x):
        if x is None:
            return None
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % ax == 0 and ax > 1:
            return jax.device_put(x, rowsh)
        if (ax > 1 and hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1
                and x.shape[0] % ax != 0):
            fell_back[0] += getattr(x, "nbytes", 0)
            fell_back[1] += 1
        return jax.device_put(x, repl)

    def place_repl(x):
        return None if x is None else jax.device_put(x, repl)

    out = {"nodes": {}, "edges": {}}
    for t, nt in tables["nodes"].items():
        out["nodes"][t] = jax.tree.map(place, nt)
    for t, et in tables["edges"].items():
        # CSR offsets must stay whole; payloads can row-shard
        out["edges"][t] = jax.tree.map(place_repl, et)
    if fell_back[1]:
        warnings.warn(
            "shard_tables: %d array(s) (%.1f MiB) have row counts not "
            "divisible by the graph axis (%d) and were REPLICATED on "
            "every device; use parallel.sharded_store.build_sharded_tables "
            "for true per-device partitioning"
            % (fell_back[1], fell_back[0] / 2**20, ax),
            stacklevel=2)
    return out


def params_sharding_rules(params, mesh: Mesh):
    """NamedSharding pytree for params: embeddings over 'graph', rest repl.

    Equivalent of the reference's min_max_variable_partitioner on
    embedding variables (feature_column.py:83-98).
    """
    def rule(path, x):
        name = "/".join(str(p.key) for p in path
                        if hasattr(p, "key"))
        if "embedding" in name and x.ndim >= 2 and \
                x.shape[0] % mesh.shape["graph"] == 0 and mesh.shape["graph"] > 1:
            return NamedSharding(mesh, P("graph"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
