"""Scale-matrix the remaining model families at the 62M-edge config.

Completes the per-family frontier cost table (VERDICT r4 #8): EgoSAGE
(bench.py) and EgoGAT (gat_scale.py) rows exist; this measures

  rgcn       EgoRGCN, 2 relations over the same 2.45M nodes (two ~31M-edge
             tables), per-relation hop tree fanout [10, 5], hidden 256,
             basis decomposition num_bases=1 (reference
             examples/tf/ego_rgcn/train_supervised.py:51-116)
  bipartite  bipartite SAGE u2i: edge seeds on u-i (1.225M users / 1.225M
             items, ~42M u-i + ~20M i-i edges), 1-layer towers + 2
             negatives, in-batch softmax loss (reference
             examples/tf/ego_bipartite_sage/train.py:80-117)
  temporal   temporal EgoSAGE: event seeds, every hop samples strictly
             before the propagated event time (exact prefix-CDF
             edge_weight, ops/temporal.py)

Same measurement discipline as gat_scale.py: scanned K-step dispatches,
tables device-resident, value-pull barriers (PERF.md rule 6).
GLT_RGCN_DEFER=1 pre-reduces the RGCN deepest level out of the grad
region (measured 49.7 -> 53.1M edges/s).

Usage: python examples/family_scale.py [--small]
           [--families rgcn,bipartite,temporal]
Writes one line per family: <family>  <eps> edges/s  <ms>/step
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _timeit(fn, params0, opt_state0, tables, K, rounds, edges_per_step):
    import jax

    params, opt_state = params0, opt_state0
    t0 = time.perf_counter()
    params, opt_state, loss = fn(params, opt_state, tables,
                                 jax.random.key(7))
    _ = float(loss)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(rounds):
        params, opt_state, loss = fn(params, opt_state, tables,
                                     jax.random.key(100 + i))
    _ = float(loss)  # true barrier
    dt = time.perf_counter() - t0
    return (edges_per_step * K * rounds / dt, dt / (K * rounds) * 1e3,
            warm)


def run_rgcn(cfg, small):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import graph_learn_tpu as gl
    from graph_learn_tpu.core.schema import Decoder
    from graph_learn_tpu.core.store import EdgeTable, NodeTable
    from graph_learn_tpu.graph import Graph
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoRGCN

    rng = np.random.default_rng(0)
    n, d = cfg["n_nodes"], cfg["feat_dim"]
    node_dec = Decoder(labeled=True, attr_types=["float"] * d)
    g = Graph()
    nt = NodeTable("item", node_dec, np.arange(n, dtype=np.int64),
                   float_attrs=rng.standard_normal((n, d), np.float32),
                   labels=rng.integers(0, cfg["classes"], n).astype(np.int32))
    g.store.add_node_table(nt)
    e_half = n * cfg["avg_degree"] // 2  # two relations, 62M total
    for rel in ("rel0", "rel1"):
        src = rng.integers(0, n, e_half)
        dst = rng.integers(0, n, e_half)
        g.store.add_edge_table(EdgeTable(
            rel, "item", "item", Decoder(weighted=True), src=src, dst=dst,
            num_src_nodes=n, num_dst_nodes=n,
            weights=rng.random(e_half).astype(np.float32)))
    g._node_decoders["item"] = node_dec
    g._initialized = True

    RELS = ["rel0", "rel1"]
    k1, k2 = (10, 5) if not small else (4, 2)
    b = cfg["batch"]
    src = g.V("item").batch(b).alias("src")
    aliases, frontier = [], [("", src)]
    for level, k in enumerate((k1, k2)):
        nxt = []
        for prefix, node in frontier:
            for r, rel in enumerate(RELS):
                alias = "%sr%d_h%d" % (prefix, r, level + 1)
                hop = node.outV(rel).sample(k).by("random").alias(alias)
                aliases.append(alias)
                nxt.append(("%sr%d_" % (prefix, r), hop))
        frontier = nxt
    q = src.values()
    R = len(RELS)
    # sampled-and-aggregated edges per step: R*k1 at level 1 plus
    # R^2*k1*k2 at level 2, per seed
    edges_per_step = b * (R * k1 + R * R * k1 * k2)

    model = EgoRGCN(dims=[d, cfg["hidden"], cfg["classes"]],
                    decoder=node_dec, num_relations=R, num_bases=1)

    def make_ego(batch):
        return EgoGraph(src=batch["src"], hops=[batch[a] for a in aliases],
                        nbr_nums=(k1, k2))

    tables = q.device_tables()
    jax.block_until_ready(tables)
    ds = gl.Dataset(q, window=1)
    params0 = model.init(jax.random.key(0), make_ego(ds.next()),
                         training=False)
    optimizer = optax.adam(1e-3)
    K = cfg.get("scan_steps", 20)
    # GLT_RGCN_DEFER=1: pre-reduce the deepest R^2 hops OUT of the grad
    # region (the EgoSAGE frontier lever applied to RGCN, PERF.md r3) —
    # grads are identical (tests/test_deferred_agg.py RGCN section)
    defer = os.environ.get("GLT_RGCN_DEFER") == "1"
    deep_aliases = aliases[-R * R:]

    @jax.jit
    def multi(params, opt_state, tables_, key):
        ft = tables_["nodes"]["item"].float_attrs

        def one(carry, k):
            p, o = carry
            ks, km, ksd = jax.random.split(k, 3)
            seeds = jax.random.randint(ksd, (b,), 0, n)
            batch = _execute(q, tables_, seeds, ks)
            if defer:
                from graph_learn_tpu.nn.data import pre_aggregate_hop
                for a in deep_aliases:
                    batch = pre_aggregate_hop(batch, a, ft, op="mean")

            def lf(pp):
                logits = model.apply(pp, make_ego(batch), training=True,
                                     rngs={"dropout": km})
                return supervised_softmax_loss(logits,
                                               batch["src"].labels)

            loss, grads = jax.value_and_grad(lf)(p)
            u, o2 = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, u), o2), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K))
        return params, opt_state, losses[-1]

    rounds = max(cfg["steps"] // K, 1)
    return _timeit(multi, params0, optimizer.init(params0), tables, K,
                   rounds, edges_per_step)


def run_bipartite(cfg, small):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import graph_learn_tpu as gl
    from graph_learn_tpu.core.schema import Decoder
    from graph_learn_tpu.core.store import EdgeTable, NodeTable
    from graph_learn_tpu.graph import Graph
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.feature_column import FeatureEncoder
    from graph_learn_tpu.nn.layers.ego import EgoLayer, EgoSAGEConv
    from graph_learn_tpu.nn.loss import \
        unsupervised_softmax_cross_entropy_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGNN

    rng = np.random.default_rng(1)
    n_u = n_i = cfg["n_nodes"] // 2
    d = cfg["feat_dim"]
    udec = Decoder(attr_types=["float"] * d)
    idec = Decoder(attr_types=["float"] * d)
    g = Graph()
    for name, dec, n_ in (("u", udec, n_u), ("i", idec, n_i)):
        g.store.add_node_table(NodeTable(
            name, dec, np.arange(n_, dtype=np.int64),
            float_attrs=rng.standard_normal((n_, d), np.float32)))
        g._node_decoders[name] = dec
    e_ui = int(cfg["n_nodes"] * cfg["avg_degree"] * 0.67)
    e_ii = cfg["n_nodes"] * cfg["avg_degree"] - e_ui
    g.store.add_edge_table(EdgeTable(
        "u-i", "u", "i", Decoder(weighted=True),
        src=rng.integers(0, n_u, e_ui), dst=rng.integers(0, n_i, e_ui),
        num_src_nodes=n_u, num_dst_nodes=n_i,
        weights=rng.random(e_ui).astype(np.float32)))
    g.store.add_edge_table(EdgeTable(
        "i-i", "i", "i", Decoder(weighted=True),
        src=rng.integers(0, n_i, e_ii), dst=rng.integers(0, n_i, e_ii),
        num_src_nodes=n_i, num_dst_nodes=n_i,
        weights=rng.random(e_ii).astype(np.float32)))
    g._initialized = True

    b = cfg["batch"]
    k1, n_neg = (10, 2) if not small else (4, 2)
    seed = g.E("u-i").batch(b).alias("seed")
    src = seed.outV().alias("src")
    dst = seed.inV().alias("dst")
    neg = src.outNeg("u-i").sample(n_neg).by("random").alias("neg")
    src.outV("u-i").sample(k1).by("random").alias("src_h1")
    dst.outV("i-i").sample(k1).by("random").alias("dst_h1")
    neg.outV("i-i").sample(k1).by("random").alias("neg_h1")
    q = seed.values()
    edges_per_step = b * (2 * k1 + n_neg * (1 + k1))

    hidden = cfg["hidden"]

    def tower(decs, name):
        return EgoGNN(
            layers=[EgoLayer(convs=[EgoSAGEConv(in_dim=(d, d),
                                                out_dim=hidden,
                                                agg_type="mean")])],
            hop_encoders=[FeatureEncoder(dc) for dc in decs], name=name)

    u_tower = tower([udec, idec], "u_tower")
    i_tower = tower([idec, idec], "i_tower")

    def egos(batch):
        src_e = EgoGraph.from_query_result(batch, "src", ["src_h1"])
        dst_e = EgoGraph.from_query_result(batch, "dst", ["dst_h1"])
        negf = batch["neg"].flat()
        neg_h1 = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])
            if hasattr(x, "reshape") else x, batch["neg_h1"])
        neg_e = EgoGraph(src=negf, hops=[neg_h1], nbr_nums=(k1,))
        return src_e, dst_e, neg_e

    tables = q.device_tables()
    jax.block_until_ready(tables)
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    s0, d0, n0 = egos(b0)
    params0 = {"u": u_tower.init(jax.random.key(0), s0),
               "i": i_tower.init(jax.random.key(1), d0)}
    optimizer = optax.adam(1e-3)
    K = cfg.get("scan_steps", 20)
    n_e = g.store.edge_table("u-i").num_edges

    @jax.jit
    def multi(params, opt_state, tables_, key):
        def one(carry, k):
            p, o = carry
            ks, km, ksd = jax.random.split(k, 3)
            seeds = jax.random.randint(ksd, (b,), 0, n_e)
            batch = _execute(q, tables_, seeds, ks)

            def lf(pp):
                src_e, dst_e, neg_e = egos(batch)
                u = u_tower.apply(pp["u"], src_e, training=True,
                                  rngs={"dropout": km})
                i = i_tower.apply(pp["i"], dst_e, training=True,
                                  rngs={"dropout": km})
                ne = i_tower.apply(pp["i"], neg_e, training=True,
                                   rngs={"dropout": km})
                return unsupervised_softmax_cross_entropy_loss(u, i, ne)

            loss, grads = jax.value_and_grad(lf)(p)
            upd, o2 = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, upd), o2), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K))
        return params, opt_state, losses[-1]

    rounds = max(cfg["steps"] // K, 1)
    return _timeit(multi, params0, optimizer.init(params0), tables, K,
                   rounds, edges_per_step)


def run_temporal(cfg, small):
    """Temporal EgoSAGE: event seeds, every hop samples edges STRICTLY
    before the propagated event time with the edge_weight strategy (the
    exact prefix-CDF temporal path, ops/temporal.py; reference: temporal
    ts filters auto-injected per hop, gsl/dag_node.py:357-392)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import graph_learn_tpu as gl
    from graph_learn_tpu.core.schema import Decoder
    from graph_learn_tpu.core.store import EdgeTable, NodeTable
    from graph_learn_tpu.graph import Graph
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE

    rng = np.random.default_rng(2)
    n, d = cfg["n_nodes"], cfg["feat_dim"]
    e = n * cfg["avg_degree"]
    node_dec = Decoder(labeled=True, attr_types=["float"] * d)
    g = Graph()
    g.store.add_node_table(NodeTable(
        "item", node_dec, np.arange(n, dtype=np.int64),
        float_attrs=rng.standard_normal((n, d), np.float32),
        labels=rng.integers(0, cfg["classes"], n).astype(np.int32)))
    g.store.add_edge_table(EdgeTable(
        "rel", "item", "item", Decoder(weighted=True, timestamped=True),
        src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
        num_src_nodes=n, num_dst_nodes=n,
        weights=rng.random(e).astype(np.float32),
        timestamps=rng.integers(0, 1_000_000, e)))
    g._node_decoders["item"] = node_dec
    g._initialized = True

    b = cfg["batch"]
    k1, k2 = cfg["fanout"] if not small else (4, 2)
    seed = g.E("rel").batch(b).alias("ev")
    src = seed.outV().alias("src")
    (src.outV("rel").sample(k1).by("edge_weight").alias("h1")
     .outV("rel").sample(k2).by("edge_weight").alias("h2"))
    q = seed.values()
    edges_per_step = b * (k1 + k1 * k2)

    model = EgoGraphSAGE([d, cfg["hidden"], cfg["classes"]], node_dec,
                         agg_type="gcn")
    tables = q.device_tables()
    jax.block_until_ready(tables)
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    ego0 = EgoGraph.from_query_result(b0, "src", ["h1", "h2"])
    params0 = model.init(jax.random.key(0), ego0, training=False)
    optimizer = optax.adam(1e-3)
    K = cfg.get("scan_steps", 20)
    n_e = g.store.edge_table("rel").num_edges

    @jax.jit
    def multi(params, opt_state, tables_, key):
        def one(carry, k):
            p, o = carry
            ks, km, ksd = jax.random.split(k, 3)
            seeds = jax.random.randint(ksd, (b,), 0, n_e)
            batch = _execute(q, tables_, seeds, ks)

            def lf(pp):
                ego = EgoGraph.from_query_result(batch, "src",
                                                 ["h1", "h2"])
                logits = model.apply(pp, ego, training=True,
                                     rngs={"dropout": km})
                return supervised_softmax_loss(logits,
                                               batch["src"].labels)

            loss, grads = jax.value_and_grad(lf)(p)
            u, o2 = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, u), o2), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jax.random.split(key, K))
        return params, opt_state, losses[-1]

    rounds = max(cfg["steps"] // K, 1)
    return _timeit(multi, params0, optimizer.init(params0), tables, K,
                   rounds, edges_per_step)


def run_walks(cfg, small):
    """Random-walk generation at the frontier: deepwalk (p=q=1) and
    node2vec (p=0.5, q=2) over the 62M store, scanned K batches per
    dispatch.  Throughput counts walk TRANSITIONS (b * (walk_len-1)) —
    the unit the reference's RandomWalk op produces
    (random_walk.cc:30-75)."""
    import jax
    import jax.numpy as jnp

    from graph_learn_tpu.ops.walk import node2vec_walk

    g, dec = bench.build_graph_inmem(cfg)
    dev = g.store.edge_table("rel").device()
    b = cfg["batch"]
    walk_len = 20 if not small else 8
    n = cfg["n_nodes"]
    K = cfg.get("scan_steps", 20)

    for label, p, qq in (("deepwalk", 1.0, 1.0), ("node2vec", 0.5, 2.0)):
        # the CSR rides as a jit ARGUMENT — closed over, its tables can
        # inline as HLO constants and blow the remote-compile body limit
        @jax.jit
        def multi(csr, key, _p=p, _q=qq):
            def one(carry, k):
                ks, ksd = jax.random.split(k)
                seeds = jax.random.randint(ksd, (b,), 0, n)
                w = node2vec_walk(csr, seeds, walk_len, ks,
                                  p=_p, q=_q)
                return carry + jnp.sum(w[:, -1].astype(jnp.int32)), None

            acc, _ = jax.lax.scan(one, jnp.int32(0),
                                  jax.random.split(key, K))
            return acc

        acc = multi(dev.out, jax.random.key(0))
        _ = int(acc)  # warm + barrier
        rounds = max(cfg["steps"] // K, 1)
        t0 = time.perf_counter()
        for i in range(rounds):
            acc = multi(dev.out, jax.random.key(1 + i))
        _ = int(acc)
        dt = time.perf_counter() - t0
        eps = b * (walk_len - 1) * K * rounds / dt
        ms = dt / (K * rounds) * 1e3
        print("walks/%-9s %.1fM transitions/s  %.2f ms/batch "
              "(len %d, b %d)" % (label, eps / 1e6, ms, walk_len, b),
              flush=True)

    return None  # per-strategy lines already printed


def main():
    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    from graph_learn_tpu.config import conf
    conf.feature_dtype = os.environ.get("GLT_FEATURE_DTYPE", "bfloat16")

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--families", default="rgcn,bipartite,temporal")
    args = ap.parse_args()
    cfg = dict(bench.CFG if args.small else bench.CFG_SCALE)
    if not args.small:
        conf.storage_profile = "minimal"

    runners = {"rgcn": run_rgcn, "bipartite": run_bipartite,
               "temporal": run_temporal, "walks": run_walks}
    for fam in args.families.split(","):
        if not args.small:
            # bipartite's outNeg needs the candidate-pool tables and
            # temporal edge_weight the CDF tables — dropped by the
            # minimal profile.  rgcn and walks run on minimal (p/q
            # walks use the windowed membership probe at this store's
            # max_degree, no sorted table needed)
            conf.storage_profile = ("full" if fam in ("bipartite",
                                                      "temporal")
                                    else "minimal")
        out = runners[fam](cfg, args.small)
        if out is not None:
            eps, ms, warm = out
            print("%-10s %.1fM edges/s  %.2f ms/step  (warm %.1fs)"
                  % (fam, eps / 1e6, ms, warm), flush=True)


if __name__ == "__main__":
    main()
