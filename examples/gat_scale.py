"""Measure EgoGAT at the 62M-edge frontier config (VERDICT r3 weak #2).

The 55.4M edges/s headline is EgoSAGE-only: its deepest-hop reduction is
params-independent, so the gather+reduce runs OUTSIDE value_and_grad and
the raw [b*k1*k2, D] rows never hit HBM.  Attention cannot pre-reduce —
the neighbor weighting depends on the attention params — so EgoGAT's
floor is different: the deepest-hop rows must materialize (they are the
residuals of the attention-weighted sum either way).  This script
measures that floor honestly, with the same scanned K-steps-per-dispatch
pipeline and true value-pull barriers as bench.py.

Two variants:
  pre=0  hop2 feature gather runs inside the differentiated step (the
         plain pipeline; XLA stores the rows as residuals)
  pre=1  hop2 rows gather in a separate phase BEFORE the train scan
         (params-independent, so grads are identical); isolates whether
         phase placement matters when the reduce cannot fuse

Usage:  python examples/gat_scale.py [--small]
Writes one line per variant: pre=<v>  <eps> edges/s  <ms>/step
Reference GAT semantics: ego_gat_conv.py multi-head attention; config
heads [8,1] (examples/tf/ego_gat/train_supervised.py:100-158).
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
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()
    cfg = dict(bench.CFG if args.small else bench.CFG_SCALE)
    cfg["hidden"] = args.hidden
    if not args.small:
        conf.storage_profile = "minimal"

    import jax
    import jax.numpy as jnp
    import optax

    import graph_learn_tpu as gl
    from graph_learn_tpu.core.values import Nodes
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGAT
    from graph_learn_tpu.ops.pallas.dispatch import feature_gather

    g, dec = bench.build_graph_inmem(cfg)
    k1, k2 = cfg["fanout"]
    b, n = cfg["batch"], cfg["n_nodes"]
    q = (g.V("item").batch(b).alias("src")
         .outV("rel").sample(k1).by("random").alias("hop1")
         .outV("rel").sample(k2).by("random").alias("hop2").values())
    # GLT_GAT_CHUNKS: comma list of EgoGATConv seed_chunk values to sweep
    # in ONE process (0 = unchunked — the r4 baseline form; default 256 —
    # the measured optimum; param shapes are chunk-independent
    # so the same init serves every sweep point)
    chunks = [int(x) for x in
              os.environ.get("GLT_GAT_CHUNKS", "256").split(",")]
    model = EgoGAT([cfg["feat_dim"], cfg["hidden"], cfg["classes"]],
                   dec, num_heads=[8, 1], seed_chunk=chunks[0])
    t0 = time.perf_counter()
    tables = q.device_tables()
    jax.block_until_ready(tables)
    print("[gat] tables on device %.1fs" % (time.perf_counter() - t0),
          flush=True)

    ds = gl.Dataset(q, window=1)
    ego0 = EgoGraph.from_query_result(ds.next(), "src", ["hop1", "hop2"])
    params0 = model.init(jax.random.key(0), ego0, training=False)
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(params0)
    K = cfg.get("scan_steps", 20)
    steps = cfg["steps"]
    edges_per_step = b * (k1 + k1 * k2)

    def make_step(pre: int):
        # pre=2: REMAT — jax.checkpoint around the whole loss.  The
        # gathered hop rows are lf's (closure) inputs so they are saved,
        # while the wide [b*k1*k2, heads*hidden] internal projections —
        # the measured GAT floor — are dropped and recomputed in the
        # backward pass: trades ~1 extra forward of MXU FLOPs for the
        # HBM round trips of every attention residual.
        @jax.jit
        def multi(params, opt_state, tables_, key):
            ft = tables_["nodes"]["item"].float_attrs

            def one(carry, k):
                p, o = carry
                ks, km, ksd = jax.random.split(k, 3)
                seeds = jax.random.randint(ksd, (b,), 0, n)
                batch = _execute(q, tables_, seeds, ks)
                if pre == 1:
                    # params-independent gather OUT of the grad region
                    ids2 = batch["hop2"].ids
                    rows = feature_gather(
                        ft, jnp.clip(ids2.reshape(-1), 0, n - 1))
                    rows = rows.reshape(ids2.shape + (ft.shape[-1],))
                    batch = dict(batch)
                    batch["hop2"] = Nodes(ids=ids2, float_attrs=rows,
                                          type_name="item")

                def lf(pp):
                    ego = EgoGraph.from_query_result(batch, "src",
                                                     ["hop1", "hop2"])
                    logits = model.apply(pp, ego, training=True,
                                         rngs={"dropout": km})
                    return supervised_softmax_loss(logits,
                                                   batch["src"].labels)

                if pre == 2:
                    lf_ = jax.checkpoint(lf)
                else:
                    lf_ = lf
                loss, grads = jax.value_and_grad(lf_)(p)
                updates, o2 = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o2), loss

            (params, opt_state), losses = jax.lax.scan(
                one, (params, opt_state), jax.random.split(key, K))
            return params, opt_state, losses[-1]

        return multi

    variants = (0, 1, 2) if os.environ.get("GLT_GAT_VARIANTS") is None \
        else tuple(int(x) for x in os.environ["GLT_GAT_VARIANTS"].split(","))
    for chunk in chunks:
        model = EgoGAT([cfg["feat_dim"], cfg["hidden"], cfg["classes"]],
                       dec, num_heads=[8, 1], seed_chunk=chunk)
        for pre in variants:
            fn = make_step(pre)
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
            _ = float(loss)  # true barrier (PERF.md rule 6)
            dt = time.perf_counter() - t0
            eps = edges_per_step * K * rounds / dt
            ms = dt / (K * rounds) * 1e3
            print("chunk=%d pre=%d  %.1fM edges/s  %.2f ms/step  "
                  "(warm %.1fs)"
                  % (chunk, pre, eps / 1e6, ms, warm), flush=True)


if __name__ == "__main__":
    main()
