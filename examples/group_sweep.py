"""Sweep the grouped-prefetch width G on the 62M-edge scale config.

Grouped prefetch (bench.py) batches G steps' sample+gather phases into one
vmapped plan execution before the train scan, exploiting that XLA's random
row gather is concurrency-limited at single-step index counts (PERF.md r3
frontier table: 15.9 -> 12.2 ns/row at 4x the indices).  This script
measures the real-pipeline value of the lever at several widths in ONE
process, so the tunnel session cost and the table upload are paid once.

Usage:  python examples/group_sweep.py [--small]
Writes one line per G:  G=<g>  <eps> edges/s  <ms>/step
"""

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

    small = "--small" in sys.argv
    cfg = dict(bench.CFG if small else bench.CFG_SCALE)
    if not small:
        conf.storage_profile = "minimal"

    import jax
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
                         dec, agg_type="gcn")
    t0 = time.perf_counter()
    tables = q.device_tables()
    jax.block_until_ready(tables)
    print("[sweep] tables on device %.1fs" % (time.perf_counter() - t0),
          flush=True)

    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    ego0 = EgoGraph.from_query_result(b0, "src", ["hop1", "hop2"])
    params0 = model.init(jax.random.key(0), ego0, training=False)
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(params0)

    K = cfg.get("scan_steps", 20)
    steps = cfg["steps"]
    edges_per_step = b * (k1 + k1 * k2)

    for G in [1, 4, 10, 20]:
        if K % G:
            continue
        os.environ["GLT_BENCH_GROUP"] = str(G)
        fn = bench.make_multi_step(q, tables, model, optimizer, cfg, G)
        params, opt_state = params0, opt_state0
        t0 = time.perf_counter()
        params, opt_state, loss = fn(params, opt_state, tables,
                                     jax.random.key(7))
        _ = float(loss)
        warm = time.perf_counter() - t0
        rounds = max(steps // K, 1)
        t0 = time.perf_counter()
        for i in range(rounds):
            params, opt_state, loss = fn(params, opt_state, tables,
                                         jax.random.key(100 + i))
        _ = float(loss)
        dt = time.perf_counter() - t0
        eps = edges_per_step * K * rounds / dt
        print("G=%-3d %12.1f edges/s   %.3f ms/step   (warmup %.1fs)"
              % (G, eps, 1e3 * dt / (K * rounds), warm), flush=True)


if __name__ == "__main__":
    main()
