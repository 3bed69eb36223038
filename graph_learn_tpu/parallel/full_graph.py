"""Full-graph distributed GCN/SAGE training over the sharded store.

Every layer is: halo all_to_all + local SpMM (parallel/halo.py) + dense
update — a capability beyond the reference, whose scale story is sampling
through graph servers (SURVEY §2.4); here the entire graph trains
full-batch in sharded HBM with ICI collectives.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_learn_tpu.parallel.halo import sharded_spmm
from graph_learn_tpu.parallel.partition import ShardedGraph


class ShardedGCN(nn.Module):
    """GCN stack where aggregation is the distributed SpMM.

    Mean-aggregation variant of gcn (deg-normalised by in-degree): each
    layer computes mean over in-neighbors (+ self) then Dense.
    """

    dims: Sequence[int]
    sg: ShardedGraph
    mesh: Mesh
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x_shards: jax.Array) -> jax.Array:
        h = x_shards  # [P, rows, D]
        for i, d in enumerate(self.dims):
            agg = sharded_spmm(self.sg, h, self.mesh, agg="mean")
            h = jnp.concatenate([h, agg], axis=-1)
            h = nn.Dense(d, name="dense_%d" % i)(h)
            if i < len(self.dims) - 1:
                h = self.act(h)
        return h


def make_full_graph_train_step(model, optimizer, mesh: Mesh,
                               loss_fn: Callable):
    """step(params, opt_state, x_shards, labels_shards, mask_shards)."""
    spec_g = P("graph")
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, spec_g)

    @jax.jit
    def step(params, opt_state, x_shards, labels, mask):
        def lf(p):
            logits = model.apply(p, x_shards)
            return loss_fn(logits, labels, mask)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
