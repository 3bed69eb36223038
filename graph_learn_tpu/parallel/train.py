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
