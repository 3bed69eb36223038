"""Scale demonstration: ogbn-products-size graph training on ONE chip.

2.45M nodes / 62M directed edges (ogbn-products has 2.45M nodes / 61.9M
undirected edges), 100 float features, EgoSAGE fanout [15, 10] fused
sample+train — the configuration the reference serves from a fleet of
CPU graph servers, HBM-resident here under conf.storage_profile=minimal.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from graph_learn_tpu.utils.platform import ensure_platform

ensure_platform()

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable, NodeTable
from graph_learn_tpu.graph import Graph
from graph_learn_tpu.gsl.compile import _execute
from graph_learn_tpu.nn.data import EgoGraph, pre_aggregate_hop
from graph_learn_tpu.nn.loss import supervised_softmax_loss
from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE


def main():
    conf.storage_profile = "minimal"
    n, e, d, classes = 2_450_000, 62_000_000, 100, 47
    b, k1, k2 = 1024, 15, 10
    rng = np.random.default_rng(0)
    print("building %dM-edge graph on host..." % (e // 1_000_000))
    t0 = time.time()
    node_dec = Decoder(labeled=True, attr_types=["float"] * d)
    g = Graph()
    nt = NodeTable("item", node_dec, np.arange(n, dtype=np.int64),
                   float_attrs=rng.standard_normal((n, d)).astype(np.float32),
                   labels=rng.integers(0, classes, n).astype(np.int32))
    g.store.add_node_table(nt)
    et = EdgeTable("rel", "item", "item", Decoder(),
                   src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
                   num_src_nodes=n, num_dst_nodes=n)
    g.store.add_edge_table(et)
    g._node_decoders["item"] = node_dec
    g._initialized = True
    print("host build %.1fs" % (time.time() - t0))

    q = (g.V("item").batch(b).alias("src")
         .outV("rel").sample(k1).by("random").alias("hop1")
         .outV("rel").sample(k2).by("random").alias("hop2").values())
    t0 = time.time()
    tables = q.device_tables()
    jax.block_until_ready(tables)
    hbm = sum(x.nbytes for x in jax.tree.leaves(tables))
    print("tables on device %.1fs (%.2f GB HBM)" % (time.time() - t0,
                                                    hbm / 1e9))

    model = EgoGraphSAGE([d, 256, classes], node_dec, agg_type="gcn")
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    ego0 = EgoGraph.from_query_result(b0, "src", ["hop1", "hop2"])
    params = model.init(jax.random.key(0), ego0, training=False)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # scanned multi-step (device-side seeds) — dispatch overhead through
    # the tunnel (~5 ms) otherwise dominates per-step timing
    K = 10

    @jax.jit
    def multi_step(params, opt_state, tables_, key):
        def one(carry, k):
            p, o = carry
            ks, km, ksd = jax.random.split(k, 3)
            seeds = jax.random.randint(ksd, (b,), 0, n)
            batch = _execute(q, tables_, seeds, ks)
            # out-of-grad deepest-hop reduction: the [b*k1*k2, D] raw rows
            # never enter value_and_grad (+19% on this config, PERF.md
            # "the frontier moved")
            batch = pre_aggregate_hop(
                batch, "hop2", tables_["nodes"]["item"].float_attrs, "mean")

            def lf(pp):
                ego = EgoGraph.from_query_result(batch, "src",
                                                 ["hop1", "hop2"])
                logits = model.apply(pp, ego, training=True,
                                     rngs={"dropout": km})
                return supervised_softmax_loss(logits, batch["src"].labels)

            loss, grads = jax.value_and_grad(lf)(p)
            upd, o2 = opt.update(grads, o, p)
            return (optax.apply_updates(p, upd), o2), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K))
        return params, opt_state, losses[-1]

    k = jax.random.key(1)
    t0 = time.time()
    k, sub = jax.random.split(k)
    params, opt_state, loss = multi_step(params, opt_state, tables, sub)
    _ = float(loss)  # true barrier: through the axon tunnel,
    # block_until_ready() returns at dispatch-ack, not completion
    print("compile+first %d steps %.1fs" % (K, time.time() - t0))
    rounds = 3
    t0 = time.time()
    for i in range(rounds):
        k, sub = jax.random.split(k)
        params, opt_state, loss = multi_step(params, opt_state, tables, sub)
    _ = float(loss)  # true barrier
    dt = time.time() - t0
    steps = rounds * K
    eps = b * (k1 + k1 * k2) * steps / dt
    print("scale demo: %.1f ms/step, %.1fM edges/s on %dM-edge graph"
          % (1000 * dt / steps, eps / 1e6, e // 1_000_000))


if __name__ == "__main__":
    main()
