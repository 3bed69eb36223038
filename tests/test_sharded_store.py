"""Graph-axis-sharded SAMPLED path (VERDICT round-1 Missing #1).

The flagship capability of the reference is training on graphs bigger
than one machine: hash-partitioned storage + request fan-out/stitch
(reference: core/partition/hash_partitioner.h:90-92,
core/runner/op_runner.h:60-152).  These tests pin the TPU equivalent:

1. the sharded plan's results are IDENTICAL to the single-device plan's
   (same key -> same draws -> the psum stitch must be exact);
2. per-device bytes really shrink vs the full store;
3. the partitioned train step runs end-to-end on a (data x graph) mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.gsl.compile import _execute
from graph_learn_tpu.parallel.mesh import make_mesh
from graph_learn_tpu.parallel.sharded_store import build_sharded_tables
from graph_learn_tpu.parallel.train import (make_partitioned_plan,
                                            make_partitioned_train_step)


@pytest.fixture
def wts_graph(tmp_path):
    """Weighted + timestamped + labeled graph through real ingest."""
    rng = np.random.default_rng(3)
    n = 50
    with open(tmp_path / "nodes", "w") as f:
        f.write("id:int64\tweight:float\tlabel:int64\tfeature:string\n")
        for i in range(n):
            feats = ":".join("%.4f" % x for x in rng.random(6))
            f.write("%d\t%.2f\t%d\t%s\n" % (i, 0.1 + i * 0.05, i % 4, feats))
    with open(tmp_path / "edges", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\ttimestamp:int64\n")
        for i in range(n):
            for j in range(1 + i % 6):
                f.write("%d\t%d\t%.2f\t%d\n"
                        % (i, (i * 7 + j * 3 + 1) % n, 0.5 + j, 100 * i + j))
    with open(tmp_path / "train", "w") as f:
        f.write("id:int64\tweight:float\n")
        for i in range(0, n, 2):
            f.write("%d\t1.0\n" % i)
    g = (gl.Graph()
         .node(str(tmp_path / "nodes"), "v",
               gl.Decoder(weighted=True, labeled=True,
                          attr_types=["float"] * 6))
         .edge(str(tmp_path / "edges"), ("v", "v", "e"),
               gl.Decoder(weighted=True, timestamped=True))
         .node(str(tmp_path / "train"), "v", gl.Decoder(weighted=True),
               mask=gl.Mask.TRAIN))
    return g.init()


def _tree_equal(a, b, path=""):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("strategy", ["random", "topk", "edge_weight",
                                      "in_degree",
                                      "random_without_replacement", "full"])
def test_sharded_plan_matches_single_device(wts_graph, strategy):
    g = wts_graph
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .outV("e").sample(3).by(strategy).alias("h1")
         .outV("e").sample(2).by("random").alias("h2").values())
    # n_data=1: the RNG stream is shaped by the per-device seed block, so
    # bitwise equality with the single-device plan holds when the data
    # axis is trivial (the graph axis never affects draws: same key, same
    # shapes on every shard).
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    seeds = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(5)
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, key)
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, key)
    _tree_equal(single, sharded)


def test_sharded_temporal_and_negatives_match(wts_graph):
    g = wts_graph
    q = (g.E("e").batch(6).alias("ev").outV().alias("src")
         .outE("e").sample(3).by("edge_weight").alias("h1")
         .values())
    q2 = (g.V("v").batch(6).alias("src")
          .outNeg("e").sample(4).by("in_degree").alias("neg").values())
    mesh = make_mesh(n_data=1, n_graph=8)
    seeds = jnp.arange(6, dtype=jnp.int32)
    key = jax.random.key(9)
    for query in (q, q2):
        stables = build_sharded_tables(query, 8).place(mesh)
        plan = make_partitioned_plan(query, mesh, stables)
        with jax.set_mesh(mesh):
            sharded = jax.jit(plan)(seeds, key)
        single = jax.jit(lambda t, s, k: _execute(query, t, s, k))(
            query.device_tables(), seeds, key)
        _tree_equal(single, sharded)


def test_sharded_plan_valid_under_data_parallelism(wts_graph):
    """(data=2, graph=4): draws differ from single-device (per-device RNG
    block shapes), so assert structural correctness: every sampled
    neighbor is a true neighbor of its seed and payload rows match."""
    g = wts_graph
    q = (g.V("v").batch(8).alias("src")
         .outE("e").sample(3).by("random").alias("h1").values())
    mesh = make_mesh(n_data=2, n_graph=4)
    stables = build_sharded_tables(q, 4).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    seeds = jnp.arange(8, dtype=jnp.int32)
    with jax.set_mesh(mesh):
        out = jax.jit(plan)(seeds, jax.random.key(2))
    et = g.store.edge_table("e")
    dev = et.device()
    ro = np.asarray(dev.out.row_offsets)
    nbr = np.asarray(dev.out.nbr_ids)
    ids = np.asarray(out["h1"].dst_nodes.ids)
    eids = np.asarray(out["h1"].edge_ids)
    for i in range(8):
        adm = set(nbr[ro[i]:ro[i + 1]].tolist())
        got = set(ids[i].tolist())
        assert got.issubset(adm), (i, got, adm)
    # edge ids are GLOBAL edge rows consistent with (src, dst)
    src_of = np.asarray(et.src)
    dst_of = np.asarray(et.dst)
    m = eids >= 0
    np.testing.assert_array_equal(src_of[eids[m]],
                                  np.broadcast_to(seeds[:, None], eids.shape)[m])
    np.testing.assert_array_equal(dst_of[eids[m]], ids[m])
    # payload lookups stitched correctly
    feats = np.asarray(g.store.node_table("v").float_attrs)
    np.testing.assert_allclose(np.asarray(out["h1"].dst_nodes.float_attrs),
                               feats[ids], rtol=1e-6)
    # edge weights stitched from the sharded edge-payload blocks
    w_of = np.asarray(et.weights)
    np.testing.assert_allclose(np.asarray(out["h1"].weights)[m],
                               w_of[eids[m]], rtol=1e-6)


def test_per_device_bytes_shrink(tmp_path):
    """On a non-toy graph each device holds ~1/P of the store (the point:
    graphs bigger than one chip's HBM).  Tiny graphs are floored by the
    128-lane tile padding, so use a few thousand nodes."""
    rng = np.random.default_rng(0)
    n, deg, f = 2000, 10, 32
    with open(tmp_path / "nodes", "w") as fh:
        fh.write("id:int64\tfeature:string\n")
        for i in range(n):
            fh.write("%d\t%s\n" % (i, ":".join(
                "%.3f" % x for x in rng.random(f))))
    with open(tmp_path / "edges", "w") as fh:
        fh.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(n):
            for j in range(deg):
                fh.write("%d\t%d\t%.2f\n" % (i, (i * 13 + j * 7) % n, j + 1.0))
    g = (gl.Graph()
         .node(str(tmp_path / "nodes"), "v", gl.Decoder(attr_types=["float"] * f))
         .edge(str(tmp_path / "edges"), ("v", "v", "e"),
               gl.Decoder(weighted=True))).init()
    q = (g.V("v").batch(8).alias("src")
         .outV("e").sample(3).by("edge_weight").alias("h1").values())
    full = q.device_tables()
    full_bytes = sum(x.nbytes for x in jax.tree.leaves(full))
    st = build_sharded_tables(q, 8)
    per_dev = st.bytes_per_device()
    assert per_dev < full_bytes * 0.3, (per_dev, full_bytes)


def test_partitioned_train_step_runs(wts_graph):
    from graph_learn_tpu.nn.data import EgoGraph
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE

    g = wts_graph
    dec = g.get_node_decoder("v")
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .outV("e").sample(4).by("edge_weight").alias("hop1")
         .outV("e").sample(2).by("random").alias("hop2").values())
    model = EgoGraphSAGE([6, 8, 4], dec, agg_type="mean")
    mesh = make_mesh(n_data=2, n_graph=4)
    stables = build_sharded_tables(q, 4).place(mesh)

    b0 = gl.Dataset(q, window=1).next()
    ego0 = EgoGraph.from_query_result(b0, "src", ["hop1", "hop2"])
    params = model.init(jax.random.key(0), ego0, training=False)

    def loss_fn(model_, p, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model_.apply(p, ego, training=training,
                              rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    opt = optax.adam(0.05)
    step = make_partitioned_train_step(q, model, loss_fn, opt, mesh, stables)
    opt_state = opt.init(params)
    seeds = jnp.arange(8, dtype=jnp.int32)
    with jax.set_mesh(mesh):
        losses = []
        for i in range(3):
            params, opt_state, loss = step(params, opt_state, seeds,
                                           jax.random.key(i))
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # it actually learns on repeated batch


def test_sharded_walks_match_single_device(wts_graph):
    """random_walk on the partitioned store: per-step psum relays compose
    exactly like hop sampling — bitwise identical to the single-device
    walk (VERDICT r2 next #4; reference random_walk.cc:30-75 walks
    shard-to-shard with per-step remote requests)."""
    g = wts_graph
    for p, q_ in ((1.0, 1.0), (0.5, 2.0)):  # deepwalk + biased node2vec
        q = (g.V("v").batch(6).alias("src")
             .random_walk(4, p=p, q=q_, edge_type="e").alias("w").values())
        mesh = make_mesh(n_data=1, n_graph=8)
        stables = build_sharded_tables(q, 8).place(mesh)
        plan = make_partitioned_plan(q, mesh, stables)
        seeds = jnp.arange(6, dtype=jnp.int32)
        key = jax.random.key(3)
        with jax.set_mesh(mesh):
            sharded = jax.jit(plan)(seeds, key)
        single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
            q.device_tables(), seeds, key)
        _tree_equal(single, sharded)


def test_sharded_conditional_negatives_match(wts_graph):
    """.where() conditional negatives on the partitioned store: replicated
    ConditionTable + one psum attribute probe — bitwise identical to the
    single-device plan (reference conditional_negative_sampler.cc:37-110
    runs against sharded storage)."""
    g = wts_graph
    seed = g.E("e").batch(6).alias("seed")
    src = seed.outV().alias("src")
    seed.inV().alias("dst")
    (src.outNeg("e").sample(4).by("node_weight")
     .where("dst", {"float_cols": [0], "float_props": [0.5]})
     .alias("neg"))
    q = seed.values()
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    seeds = jnp.arange(6, dtype=jnp.int32)
    key = jax.random.key(11)
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, key)
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, key)
    _tree_equal(single, sharded)


def test_temporal_filter_composes(wts_graph):
    """.filter() + temporal traversal (previously rejected): samples obey
    BOTH constraints — ts strictly before the seed edge's ts AND dst != the
    filtered target — on single-device and partitioned stores alike."""
    g = wts_graph
    seed = g.E("e").batch(8).alias("ev")
    src = seed.outV().alias("src")
    seed.inV().alias("dst")
    src.outE("e").sample(3).by("edge_weight").filter("dst").alias("h1")
    q = seed.values()
    seeds = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(7)
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, key)
    et = wts_graph.store.edge_table("e")
    ts_of = np.asarray(et.timestamps)
    seed_ts = ts_of[np.asarray(seeds)]
    dst_ids = np.asarray(single["dst"].ids)
    h1_eids = np.asarray(single["h1"].edge_ids)
    h1_ids = np.asarray(single["h1"].dst_nodes.ids)
    m = h1_eids >= 0
    # temporal bound: every sampled edge is strictly before the seed edge
    assert (ts_of[h1_eids[m]]
            < np.broadcast_to(seed_ts[:, None], h1_eids.shape)[m]).all()
    # filter: the positive dst never appears among same-row samples
    for i in range(8):
        row = h1_ids[i][h1_eids[i] >= 0]
        assert dst_ids[i] not in row.tolist(), (i, dst_ids[i], row)
    # partitioned store matches bitwise
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, key)
    _tree_equal(single, sharded)


@pytest.mark.parametrize("strategy", ["random", "topk",
                                      "random_without_replacement"])
def test_temporal_filter_all_strategies(wts_graph, strategy):
    """Exclude-dst filters compose with the before-t prefix on every
    temporal strategy (reference stacks Filter(ts) + Filter(id) inside
    one sampler, sampler/filter.cc Filter::HitAll)."""
    g = wts_graph
    seed = g.E("e").batch(8).alias("ev")
    src = seed.outV().alias("src")
    seed.inV().alias("dst")
    src.outE("e").sample(3).by(strategy).filter("dst").alias("h1")
    q = seed.values()
    seeds = jnp.arange(8, dtype=jnp.int32)
    out = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, jax.random.key(1))
    et = wts_graph.store.edge_table("e")
    ts_of = np.asarray(et.timestamps)
    seed_ts = ts_of[np.asarray(seeds)]
    h1_eids = np.asarray(out["h1"].edge_ids)
    h1_ids = np.asarray(out["h1"].dst_nodes.ids)
    dst_ids = np.asarray(out["dst"].ids)
    m = h1_eids >= 0
    assert (ts_of[h1_eids[m]]
            < np.broadcast_to(seed_ts[:, None], h1_eids.shape)[m]).all()
    for i in range(8):
        row = h1_ids[i][h1_eids[i] >= 0]
        assert dst_ids[i] not in row.tolist(), (i, strategy)


def test_temporal_filter_full(wts_graph):
    """full strategy + filter + temporal: the filtered prefix excludes the
    positive dst and every kept edge satisfies the ts bound."""
    g = wts_graph
    seed = g.E("e").batch(8).alias("ev")
    src = seed.outV().alias("src")
    seed.inV().alias("dst")
    src.outV("e").sample(5).by("full").filter("dst").alias("h1")
    q = seed.values()
    seeds = jnp.arange(8, dtype=jnp.int32)
    out = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, jax.random.key(1))
    et = wts_graph.store.edge_table("e")
    src_np = np.asarray(et.src)
    dst_np = np.asarray(et.dst)
    ts_np = np.asarray(et.timestamps)
    seed_ts = ts_np[np.asarray(seeds)]
    src_ids = np.asarray(out["src"].ids)
    dst_ids = np.asarray(out["dst"].ids)
    h1 = out["h1"]
    ids = np.asarray(h1.ids)
    deg = np.asarray(h1.degrees)
    for i in range(8):
        row = ids[i, :deg[i]]
        assert dst_ids[i] not in row.tolist(), (i, dst_ids[i], row)
        for v in row:
            # an edge src->v with ts < seed_ts[i] must exist
            cand = (src_np == src_ids[i]) & (dst_np == v) & \
                (ts_np < seed_ts[i])
            assert cand.any(), (i, v)


@pytest.mark.parametrize("routing", ["owner", "psum"])
def test_payload_routing_modes_identical(wts_graph, routing):
    """The owner-routed payload exchange (all_to_all to owning shards,
    O(n*D) bytes) and the psum stitch (O(P*n*D)) must produce bitwise
    identical results (VERDICT r2 next #2)."""
    g = wts_graph
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .outV("e").sample(4).by("edge_weight").alias("h1").values())
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables, routing=routing)
    seeds = jnp.arange(8, dtype=jnp.int32)
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, jax.random.key(5))
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, jax.random.key(5))
    _tree_equal(single, sharded)


def test_owner_routing_overflow_falls_back_exactly(wts_graph):
    """Adversarial skew: every request owned by ONE shard overflows the
    all_to_all buckets; the psum fallback must keep results exact."""
    from graph_learn_tpu.config import conf

    g = wts_graph
    q = (g.V("v").batch(128).alias("src")
         .outV("e").sample(3).by("topk").alias("h1").values())
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    # all seeds identical -> all payload requests hit one owner; with
    # batch*k = 384 flat ids, m = 48/shard, capacity = ceil(48*2/8)+8 = 20
    # < 48 -> guaranteed overflow on the owning shard's bucket
    seeds = jnp.full((128,), 7, jnp.int32)
    plan = make_partitioned_plan(q, mesh, stables, routing="owner")
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, jax.random.key(1))
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, jax.random.key(1))
    _tree_equal(single, sharded)
    assert conf.owner_route_capacity == 2.0  # default untouched


def test_owner_routing_under_data_parallelism(wts_graph):
    """(data=2, graph=4) with owner routing: structural correctness and
    payload rows match the table (striped reassembly across both axes)."""
    g = wts_graph
    q = (g.V("v").batch(8).alias("src")
         .outV("e").sample(4).by("random").alias("h1").values())
    mesh = make_mesh(n_data=2, n_graph=4)
    stables = build_sharded_tables(q, 4).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables, routing="owner")
    seeds = jnp.arange(8, dtype=jnp.int32)
    with jax.set_mesh(mesh):
        out = jax.jit(plan)(seeds, jax.random.key(2))
    ids = np.asarray(out["h1"].ids)
    feats = np.asarray(wts_graph.store.node_table("v").float_attrs)
    np.testing.assert_allclose(np.asarray(out["h1"].float_attrs),
                               feats[ids], rtol=1e-6)


@pytest.mark.parametrize("need_dist", [False, True])
def test_sharded_subgraph_matches_single_device(wts_graph, need_dist):
    """SubGraph/SEAL induction on the partitioned store (VERDICT r3
    Missing #1): the full-neighbor candidate pass is a row-sharded op
    (ops/subgraph._full_candidates), membership/compaction/BFS replicate —
    bitwise identical to the single-device induction (reference:
    SubGraphSampler runs on the distributed store,
    subgraph_sampler.cc:27-80)."""
    g = wts_graph
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .SubGraph("e", nbr_cap=8, need_dist=need_dist).alias("sg")
         .values())
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    seeds = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(5)
    with jax.set_mesh(mesh):
        sharded = jax.jit(plan)(seeds, key)
    single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        q.device_tables(), seeds, key)
    _tree_equal(single, sharded)
    # the sharded induction found real edges, not a degenerate empty set
    assert int(np.asarray(sharded["sg"].num_edges)) > 0


def test_sharded_subgraph_data_parallel_stacks(wts_graph):
    """SubGraph × data parallelism (VERDICT r4 Missing #2): on a
    (data=2, graph=4) mesh each data shard induces INDEPENDENTLY over its
    local seeds and the SubGraphVal comes back stacked [n_data, ...] —
    each stacked slice bitwise-equals the single-device induction of that
    shard's seeds (reference: per-batch independent inductions,
    subgraph_sampler.cc:27-80)."""
    g = wts_graph
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .SubGraph("e", nbr_cap=8, need_dist=True).alias("sg")
         .values())
    mesh = make_mesh(n_data=2, n_graph=4)
    stables = build_sharded_tables(q, 4).place(mesh)
    plan = make_partitioned_plan(q, mesh, stables)
    seeds = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(5)
    with jax.set_mesh(mesh):
        out = jax.jit(plan)(seeds, key)
    sg = out["sg"]
    tables = q.device_tables()
    for d in range(2):
        half = seeds[d * 4:(d + 1) * 4]
        single = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
            tables, half, key)["sg"]
        stacked_slice = jax.tree.map(lambda x: x[d], sg)
        _tree_equal(single, stacked_slice)
    assert int(np.asarray(sg.num_edges).sum()) > 0


def test_sharded_subgraph_data_parallel_train_step(wts_graph):
    """A SEAL-style train step over the 2x4 mesh with stacked SubGraphs:
    the loss (vmapped GCN readout over the stacked axis) equals the mean
    of the two single-device per-shard losses with the same params."""
    from graph_learn_tpu.nn.models.sub_models import GCN
    from graph_learn_tpu.nn.subgraph_data import BatchGraph

    g = wts_graph
    q = (g.V("v", mask=gl.Mask.TRAIN).batch(8).alias("src")
         .SubGraph("e", nbr_cap=8, need_dist=False).alias("sg")
         .values())
    mesh = make_mesh(n_data=2, n_graph=4)
    stables = build_sharded_tables(q, 4).place(mesh)
    model = GCN([6, 8, 2])

    def sg_loss_one(p, sgv, km):
        bg = BatchGraph.from_subgraphs(
            jax.tree.map(lambda x: x[None], sgv))
        x = jnp.where(bg.node_mask[:, None], sgv.nodes.float_attrs, 0.0)
        h = model.apply(p, bg.edge_index, x,
                        edge_mask=bg.edge_mask)
        return jnp.mean(jnp.where(bg.node_mask[:, None], h, 0.0) ** 2)

    def loss_fn(model_, p, batch, km, training):
        sg = batch["sg"]
        if sg.node_ids.ndim == 2:  # stacked [n_data, ...]
            losses = jax.vmap(lambda s: sg_loss_one(p, s, km))(sg)
            return jnp.mean(losses)
        return sg_loss_one(p, sg, km)

    # init params from a single-device batch
    tables = q.device_tables()
    seeds = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.key(3)
    single0 = jax.jit(lambda t, s, k: _execute(q, t, s, k))(
        tables, seeds[:4], key)
    bg0 = BatchGraph.from_subgraphs(
        jax.tree.map(lambda x: x[None], single0["sg"]))
    params = model.init(jax.random.key(0), bg0.edge_index,
                        single0["sg"].nodes.float_attrs,
                        edge_mask=bg0.edge_mask)

    opt = optax.sgd(0.1)
    step = make_partitioned_train_step(q, model, loss_fn, opt, mesh,
                                       stables)
    opt_state = opt.init(params)
    with jax.set_mesh(mesh):
        _, _, loss = step(params, opt_state, seeds, key)

    # oracle: same key => plan's internal split reproduces; compare the
    # mean of per-shard single-device losses
    ks, km = jax.random.split(key)
    want = np.mean([
        float(loss_fn(model, params,
                      jax.jit(lambda t, s, k: _execute(q, t, s, k))(
                          tables, seeds[d * 4:(d + 1) * 4], ks),
                      km, True))
        for d in range(2)])
    np.testing.assert_allclose(float(loss), want, rtol=1e-6, atol=1e-6)
