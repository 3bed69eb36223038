"""Measure the host-RAM storage tier against the device tier.

The host tier (gsl/dataset.py tier="host") exists so graphs larger than
one chip's HBM still train on that chip — the reference's own
architecture (host-resident store feeding the accelerator,
nn/tf/data/dataset.py:226-241 from_generator seam).  This harness puts a
number on what that fallback costs: the same train-step shapes the
trainer uses run the default bench graph (200k nodes / 3.2M edges, batch 1024, fanout
[15,10]) in three shapes:

  device   device tier — sampling fused into the jitted train step on
           the accelerator (step-per-dispatch, unlike bench.py's K-step
           scan, so tunnel RTT bounds it here)
  host     host tier — sampling on the CPU backend from host-pinned
           tables via Dataset(tier='host'), per-batch transfer, jitted
           train step
  host+agg host tier with the deepest-hop pre-reduction running ON THE
           CPU side (Dataset transform), shrinking the shipped hop2
           payload by k2 before it crosses to the accelerator

Usage: python examples/host_tier_bench.py [--small] [--steps N]
Writes one line per shape: <tier>  <eps> edges/s  <ms>/step
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    from graph_learn_tpu.config import conf
    conf.feature_dtype = os.environ.get("GLT_FEATURE_DTYPE", "bfloat16")

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()
    cfg = dict(bench.CFG_SMALL if hasattr(bench, "CFG_SMALL") and args.small
               else bench.CFG)
    if args.small:
        cfg.update(n_nodes=20_000, batch=256, feat_dim=64, hidden=64)

    import jax
    import optax

    from graph_learn_tpu.nn.data import EgoGraph, pre_aggregate_hop
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE

    import graph_learn_tpu as gl

    g, dec = bench.build_graph_inmem(cfg)
    k1, k2 = cfg["fanout"]
    b = cfg["batch"]
    q = (g.V("item").batch(b).alias("src")
         .outV("rel").sample(k1).by("random").alias("hop1")
         .outV("rel").sample(k2).by("random").alias("hop2").values())
    model = EgoGraphSAGE([cfg["feat_dim"], cfg["hidden"], cfg["classes"]],
                         dec, agg_type="gcn", dropout=0.0)
    ego0 = EgoGraph.from_query_result(gl.Dataset(q, window=1).next(),
                                      "src", ["hop1", "hop2"])
    params0 = model.init(jax.random.key(0), ego0, training=False)
    edges_per_step = b * (k1 + k1 * k2)
    steps = args.steps

    def loss_fn(model, p, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    def agg_transform(batch, tables):
        return pre_aggregate_hop(
            batch, "hop2", tables["nodes"]["item"].float_attrs, op="mean")

    import optax as _optax
    optimizer = _optax.adam(1e-3)

    from graph_learn_tpu.gsl.compile import _execute

    def run_device():
        tables = q.device_tables()

        @jax.jit
        def step(params, opt_state, tables, seeds, key):
            ks, km = jax.random.split(key)
            batch = _execute(q, tables, seeds, ks)

            def lf(p):
                return loss_fn(model, p, batch, km, True)

            loss, grads = jax.value_and_grad(lf)(params)
            u, o2 = optimizer.update(grads, opt_state, params)
            return _optax.apply_updates(params, u), o2, loss

        n = cfg["n_nodes"]
        params, opt_state = params0, optimizer.init(params0)
        key = jax.random.key(1)

        def iters(k_):
            nonlocal params, opt_state, key
            loss = None
            for i in range(k_):
                key, s1, s2 = jax.random.split(key, 3)
                seeds = jax.random.randint(s1, (b,), 0, n)
                params, opt_state, loss = step(params, opt_state, tables,
                                               seeds, s2)
            return loss

        _ = float(iters(3))  # warm: compile + real table transfer
        t0 = time.perf_counter()
        _ = float(iters(steps))
        return time.perf_counter() - t0

    def run_host(transform):
        ds = gl.Dataset(q, tier="host", transform=transform, seed=2)

        @jax.jit
        def step(params, opt_state, batch, key):
            def lf(p):
                return loss_fn(model, p, batch, key, True)

            loss, grads = jax.value_and_grad(lf)(params)
            u, o2 = optimizer.update(grads, opt_state, params)
            return _optax.apply_updates(params, u), o2, loss

        params, opt_state = params0, optimizer.init(params0)
        key = jax.random.key(1)

        def iters(k_):
            nonlocal params, opt_state, key
            loss = None
            for i in range(k_):
                batch, _ = ds.next_with_count()
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, sub)
            return loss

        _ = float(iters(3))
        t0 = time.perf_counter()
        _ = float(iters(steps))
        return time.perf_counter() - t0

    for label, fn in (("device", run_device),
                      ("host", lambda: run_host(None)),
                      ("host+agg", lambda: run_host(agg_transform))):
        dt = fn()
        print("%-9s %6.1fM edges/s  %7.2f ms/step"
              % (label, edges_per_step * steps / dt / 1e6,
                 dt / steps * 1e3), flush=True)


if __name__ == "__main__":
    main()
