"""Measure the host-tier prefetch OVERLAP claim (VERDICT r4 weak #3).

PERF.md's host-tier section argues the Dataset prefetch window overlaps
CPU-side sampling with accelerator train steps.  Both run as async XLA
dispatches on different backends, so overlap is *possible* — this probe
measures whether it *happens* on this machine:

  t_host   mean wall time of ONE host-tier sample, forced synchronous
           (value-pull on the CPU result before the next dispatch)
  t_dev    mean wall time of one device train step on a pre-staged
           batch (value-pull barrier)
  t_loop   mean per-step wall time of the REAL pipelined loop
           (Dataset(tier='host', window=W) feeding the jitted step,
           barrier only at the end)

  overlap factor = (t_host + t_dev) / t_loop
    1.0x  = fully serialized (no overlap)
    ceiling = (t_host + t_dev) / max(t_host, t_dev)

Usage: python examples/host_overlap_probe.py [--small] [--steps N]
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
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--window", default="1,2,4")
    args = ap.parse_args()
    cfg = dict(bench.CFG)
    if args.small:
        cfg.update(n_nodes=20_000, batch=256, feat_dim=64, hidden=64)

    import jax
    import jax.numpy as jnp
    import optax

    import graph_learn_tpu as gl
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE

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
    optimizer = optax.adam(1e-3)
    steps = args.steps
    edges_per_step = b * (k1 + k1 * k2)

    @jax.jit
    def step(params, opt_state, batch, key):
        def lf(p):
            ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
            logits = model.apply(p, ego, training=True,
                                 rngs={"dropout": key})
            return supervised_softmax_loss(logits, batch["src"].labels)

        loss, grads = jax.value_and_grad(lf)(params)
        u, o2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, u), o2, loss

    # --- t_host: synchronous host sampling ----------------------------
    ds = gl.Dataset(q, tier="host", seed=2, window=1)
    batches = []
    for _ in range(3):  # warm compile + transfer
        bt, _ = ds.next_with_count()
        jax.block_until_ready(bt)
        batches.append(bt)
    t0 = time.perf_counter()
    for _ in range(steps):
        bt, _ = ds.next_with_count()
        jax.block_until_ready(bt)  # window=1: each dispatch fully drains
    t_host = (time.perf_counter() - t0) / steps

    # --- t_dev: device step on a pre-staged batch ----------------------
    params, opt_state = params0, optimizer.init(params0)
    key = jax.random.key(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batches[0], sub)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, batches[i % len(batches)], sub)
    _ = float(loss)  # true barrier
    t_dev = (time.perf_counter() - t0) / steps

    # --- t_loop: the real pipelined loop, per window width -------------
    ceiling = (t_host + t_dev) / max(t_host, t_dev)
    print("t_host %.1f ms  t_dev %.1f ms  (overlap ceiling %.2fx)"
          % (t_host * 1e3, t_dev * 1e3, ceiling), flush=True)
    for w in [int(x) for x in str(args.window).split(",")]:
        ds2 = gl.Dataset(q, tier="host", seed=3, window=w)
        params, opt_state = params0, optimizer.init(params0)
        key = jax.random.key(4)
        for _ in range(3):
            bt, _ = ds2.next_with_count()
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, bt, sub)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            bt, _ = ds2.next_with_count()
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, bt, sub)
        _ = float(loss)
        t_loop = (time.perf_counter() - t0) / steps
        factor = (t_host + t_dev) / t_loop
        print("window=%d  t_loop %.1f ms  overlap %.2fx  %.2fM edges/s"
              % (w, t_loop * 1e3, factor, edges_per_step / t_loop / 1e6),
              flush=True)


if __name__ == "__main__":
    main()
