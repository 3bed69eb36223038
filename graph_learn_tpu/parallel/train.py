"""Sharded training step: data-parallel seeds over a mesh.

Replaces the reference's PS/worker between-graph replication
(reference: examples/tf/trainer.py:327-371 DistTrainer with
replica_device_setter + async AdamAsyncOptimizer + sync barrier): here the
step is ONE SPMD program — seeds sharded over the "data" axis, parameters
replicated (synchronous by construction; XLA inserts the gradient psum),
graph tables placed by parallel/mesh.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_learn_tpu.gsl.compile import Query, _execute


def make_partitioned_plan(query: Query, mesh: Mesh, stables,
                          routing: str = None):
    """Compile the GSL plan over a graph-axis-SHARDED store.

    Returns plan(seeds, key) -> {alias: value}: seeds sharded P('data'),
    graph tables partitioned P('graph') (parallel/sharded_store.py).
    Id-sized results (sampled neighbor/edge ids, degrees, scalars) are
    stitched with one psum; payload vectors (feature rows — the expensive
    leaves) follow ``conf.partition_routing``:

    - "owner" (default): requests are all_to_all'd to owning shards which
      gather locally and all_to_all the rows back — O(n*D) bytes over the
      axis, results striped P(('data','graph')) and reassembled here.
      This matches the reference's owner routing (each shard processes
      only its shard's rows, core/runner/op_runner.h:60-152).
    - "psum": the round-2 masked psum stitch (O(P*n*D) bytes), kept as
      the always-correct fallback.

    Both paths are exact and bitwise-identical (tests/test_sharded_store).
    """
    from functools import partial as _partial

    from jax import shard_map

    from graph_learn_tpu.config import conf
    from graph_learn_tpu.core.sharding import Striped, owner_routing
    from graph_learn_tpu.core.values import SubGraphVal

    axis = stables.axis
    nsh = stables.num_shards
    routing = routing or conf.partition_routing
    n_data = mesh.shape.get("data", 1)

    # SubGraph × data parallelism: each data shard runs an INDEPENDENT
    # induction over its local seeds (reference: every client batch is an
    # independent induction against the same distributed store,
    # subgraph_sampler.cc:27-80).  The per-shard SubGraphVals come back
    # STACKED — every leaf (node_ids, edge_index, num_nodes, ...) gains a
    # leading [n_data] axis; consumers either vmap over it or pass the
    # stacked value straight to BatchGraph.from_subgraphs (which treats
    # the leading axis as its sample dim, exactly the per-sample
    # batching semantics of the reference's BatchGraph.from_graphs).
    has_subgraph = any(n.kind == "subgraph" for n in query.dag.nodes)
    stack_sg = has_subgraph and n_data > 1

    _is_striped = lambda x: isinstance(x, Striped)

    def _stack_subgraphs(out):
        if not stack_sg:
            return out
        return {
            a: (jax.tree.map(
                lambda x: x if _is_striped(x) else x[None],
                v, is_leaf=_is_striped) if isinstance(v, SubGraphVal)
                else v)
            for a, v in out.items()}

    def body(stacked, repl, seeds, key):
        block = jax.tree.map(lambda x: x[0], stacked)  # graph-axis block
        view = stables.view(block, repl)
        if routing == "owner":
            with owner_routing(axis, nsh):
                return _stack_subgraphs(_execute(query, view, seeds, key))
        return _stack_subgraphs(_execute(query, view, seeds, key))

    def abstract_body(stacked, repl, seeds, key):
        # structure discovery: same trace with collectives stubbed out.
        # nshards=1 disables payload deferral so the psum-routing
        # structure matches its real body (no Striped leaves).
        block = jax.tree.map(lambda x: x[0], stacked)
        view = stables.view(block, repl)
        with owner_routing(axis, nsh if routing == "owner" else 1,
                           abstract=True):
            return _stack_subgraphs(_execute(query, view, seeds, key))

    _cache = {}

    def build(seeds, key):
        local_seeds = jax.ShapeDtypeStruct(
            (seeds.shape[0] // n_data,) + seeds.shape[1:], seeds.dtype)
        out_struct = jax.eval_shape(abstract_body, stables.stacked,
                                    stables.repl, local_seeds, key)

        def spec_of(x):
            if _is_striped(x):
                return Striped(local=P(("data", axis)),
                               logical_shape=x.logical_shape)
            if x.ndim == 0:
                # rank-0 leaves (SubGraph num_nodes/num_edges when
                # n_data == 1) are replicated: every graph shard computes
                # the identical psum-stitched value.  With n_data > 1
                # subgraph leaves carry the stacked leading axis instead.
                return P()
            return P("data")

        out_specs = jax.tree.map(spec_of, out_struct, is_leaf=_is_striped)
        return shard_map(body, mesh=mesh,
                         in_specs=(P(axis), P(), P("data"), P()),
                         out_specs=out_specs, check_vma=False)

    def _reassemble(x, in_sg: bool = False):
        if not _is_striped(x):
            return x
        # logical_shape is the per-data-shard result shape; globally the
        # leading dim scales by the data-axis size — concatenated for
        # batch-like leaves, stacked [n_data, ...] inside SubGraphVals
        shp = tuple(x.logical_shape)
        if in_sg and stack_sg:
            return x.local.reshape((n_data,) + shp)
        return x.local.reshape((shp[0] * n_data,) + shp[1:])

    def plan(seeds, key, stacked=None, repl=None):
        """stacked/repl default to the closed-over stables'; pass them
        explicitly to keep the table arrays jit ARGUMENTS (required in
        multi-process settings, where a process cannot materialise a
        closed-over constant spanning non-addressable devices)."""
        ck = (seeds.shape, str(seeds.dtype))
        if ck not in _cache:
            _cache[ck] = build(seeds, key)
        out = _cache[ck](stacked if stacked is not None else stables.stacked,
                         repl if repl is not None else stables.repl,
                         seeds, key)
        return {
            a: jax.tree.map(
                partial(_reassemble, in_sg=isinstance(v, SubGraphVal)),
                v, is_leaf=_is_striped)
            for a, v in out.items()}

    return plan


def make_partitioned_train_step(query: Query, model, loss_fn: Callable,
                                optimizer: optax.GradientTransformation,
                                mesh: Mesh, stables):
    """Full SPMD train step over a partitioned graph store.

    Composition: the shard_map sampling plan (graph axis) feeds the GSPMD
    model step (data axis); XLA inserts the gradient all-reduce from the
    sharding constraints, exactly like make_sharded_train_step — but here
    no device ever holds more than 1/P of the graph tables.
    """
    plan = make_partitioned_plan(query, mesh, stables)
    seed_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # the sharded tables enter as jit ARGUMENTS (not closure constants):
    # in multi-process meshes a process holds only its addressable blocks,
    # and jit would otherwise inline small tables as full-value constants
    @partial(jax.jit,
             in_shardings=(repl, repl, seed_sh, repl, None, None),
             out_shardings=(repl, repl, repl))
    def step_impl(params, opt_state, seeds, key, stacked, repl_tables):
        ks, km = jax.random.split(key)
        batch = plan(seeds, ks, stacked=stacked, repl=repl_tables)

        def lf(p):
            return loss_fn(model, p, batch, km, True)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    def step(params, opt_state, seeds, key):
        return step_impl(params, opt_state, seeds, key,
                         stables.stacked, stables.repl)

    return step


def make_sharded_train_step(query: Query, model, loss_fn: Callable,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh):
    """Returns jitted step(params, opt_state, tables, seeds, key).

    seeds are sharded P('data'); params/opt_state replicated; the loss
    gradient all-reduce is inserted by XLA from the sharding constraints.
    """
    seed_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(repl, repl, None, seed_sh, repl),
             out_shardings=(repl, repl, repl))
    def step(params, opt_state, tables, seeds, key):
        ks, km = jax.random.split(key)
        batch = _execute(query, tables, seeds, ks)

        def lf(p):
            return loss_fn(model, p, batch, km, True)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return step


class DistTrainer:
    """Epoch-loop trainer over the sharded step (reference DistTrainer,
    examples/tf/trainer.py:327-371 — but synchronous SPMD: no PS, no
    async optimizer, no worker barrier; the mesh IS the cluster).

    Same call shape as nn.trainer.LocalTrainer.train; seeds stream from
    the query's source traversal and are placed with P('data') sharding
    each step.  Works on a single-process multi-device mesh directly; in
    multi-process settings each process feeds its addressable shard (see
    tests/test_multiprocess.py for the make_array_from_single_device_
    arrays pattern).

    Storage placement: when the mesh has a graph axis > 1 and the query's
    tables exceed ``partition_above_bytes``, the RANGE-PARTITIONED store
    is used (build_sharded_tables + make_partitioned_train_step — every
    device holds 1/P of the payload).  Below the threshold, or when the
    query uses a feature the partitioned path doesn't support yet, tables
    are placed by parallel/mesh.shard_tables (which warns about any array
    it has to replicate).
    """

    def __init__(self, mesh: Mesh, seed: int = 0,
                 partition_above_bytes: int = 64 << 20):
        self.mesh = mesh
        self.seed = seed
        self.partition_above_bytes = partition_above_bytes

    def train(self, query: Query, model, params, loss_fn: Callable,
              optimizer: optax.GradientTransformation, tables=None,
              epochs: int = 1, steps_per_epoch=None, verbose: bool = True):
        import numpy as np

        from graph_learn_tpu.core.traversal import Traverser
        from graph_learn_tpu.errors import OutOfRangeError

        seed_sh = NamedSharding(self.mesh, P("data"))
        run_step = None
        if tables is None:
            gx = self.mesh.shape.get("graph", 1)
            if gx > 1:
                from graph_learn_tpu.errors import InvalidArgumentError
                from graph_learn_tpu.parallel.sharded_store import (
                    build_sharded_tables, estimate_query_table_bytes)
                if (estimate_query_table_bytes(query)
                        >= self.partition_above_bytes):
                    try:
                        stables = build_sharded_tables(query, gx).place(
                            self.mesh)
                        run_step = make_partitioned_train_step(
                            query, model, loss_fn, optimizer, self.mesh,
                            stables)
                    except InvalidArgumentError as e:
                        import warnings
                        warnings.warn(
                            "DistTrainer: falling back to replicated "
                            "tables (%s)" % e, stacklevel=2)
            if run_step is None:
                from graph_learn_tpu.parallel.mesh import shard_tables
                tables = shard_tables(query.device_tables(), self.mesh)
        if run_step is None:
            full_step = make_sharded_train_step(query, model, loss_fn,
                                                optimizer, self.mesh)
            run_step = lambda p, o, s, k: full_step(p, o, tables, s, k)
        opt_state = optimizer.init(params)
        size, space = query.source_space()
        trav = Traverser(size, query.dag.batch_size,
                         strategy=query.source.strategy, seed=self.seed)
        idx = (query.graph.store.node_set(query.source.node_type).indices
               if space == "node" else None)
        if trav.strategy == "random" and steps_per_epoch is None:
            raise ValueError("a 'random' (shuffle()) source never exhausts "
                             "an epoch; pass steps_per_epoch")
        key = jax.random.key(self.seed)
        history = []
        for epoch in range(epochs):
            losses, ep = [], 0
            while steps_per_epoch is None or ep < steps_per_epoch:
                try:
                    pos, _ = trav.next()
                except OutOfRangeError:
                    break
                ep += 1
                seeds = np.asarray(idx[pos] if idx is not None else pos,
                                   np.int32)
                seeds = jax.device_put(jnp.asarray(seeds), seed_sh)
                key, sub = jax.random.split(key)
                params, opt_state, loss = run_step(params, opt_state,
                                                   seeds, sub)
                losses.append(loss)
            mean = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            history.append(mean)
            if verbose:
                print("epoch %d loss %.4f" % (epoch, mean))
        return params, history
