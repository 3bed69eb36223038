"""GSL pipeline tests: traverse + sampling + lookup shapes.

Mirrors reference GSL tests
(reference: graphlearn/python/gsl/tests/{test_gsl_traverse,test_gsl_sampling,
test_gsl_mask}.py and examples/basic/query_examples.py:20-80 shape asserts).
"""

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.errors import OutOfRangeError


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    g.node(tmp_graph_dir["train"], node_type="item",
           decoder=gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
    return g.init()


def test_v_traverse_batch(g, tmp_graph_dir):
    q = g.V("item").batch(8).alias("src").values()
    ds = gl.Dataset(q, window=1)
    out = ds.next()
    src = out["src"]
    assert src.ids.shape == (8,)
    assert src.float_attrs.shape == (8, 4)
    assert src.labels.shape == (8,)
    # by_order: first batch is nodes 0..7
    np.testing.assert_array_equal(np.asarray(src.ids), np.arange(8))
    np.testing.assert_array_equal(np.asarray(src.raw_ids), np.arange(8) * 10)


def test_v_masked_traverse(g, tmp_graph_dir):
    q = g.V("item", mask=gl.Mask.TRAIN).batch(5).alias("t").values()
    ds = gl.Dataset(q, window=1)
    out = ds.next()
    ids = np.asarray(out["t"].ids)
    assert set(ids).issubset(set(range(0, tmp_graph_dir["n"], 2)))
    # labels come from the BASE table (mask tables have no labels)
    np.testing.assert_array_equal(np.asarray(out["t"].labels), ids % 5)


def test_two_hop_shapes(g):
    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("random").alias("hop1")
         .outV("rel").sample(2).by("topk").alias("hop2")
         .values())
    ds = gl.Dataset(q, window=1)
    out = ds.next()
    assert out["src"].ids.shape == (4,)
    assert out["hop1"].ids.shape == (4, 3)
    assert out["hop2"].ids.shape == (4, 3, 2)
    assert out["hop2"].float_attrs.shape == (4, 3, 2, 4)


def test_epoch_out_of_range(g, tmp_graph_dir):
    n = tmp_graph_dir["n"]
    q = g.V("item").batch(16).alias("src").values()
    ds = gl.Dataset(q, window=2)
    batches = 0
    with pytest.raises(OutOfRangeError):
        for _ in range(100):
            ds.next()
            batches += 1
    assert batches == (n + 15) // 16
    # next epoch proceeds
    out = ds.next()
    assert out["src"].ids.shape == (16,)


def test_edge_traverse(g, tmp_graph_dir):
    q = g.E("rel").batch(6).alias("e").values()
    ds = gl.Dataset(q, window=1)
    out = ds.next()
    e = out["e"]
    assert e.edge_ids.shape == (6,)
    assert e.src_nodes.ids.shape == (6,)
    assert e.weights.shape == (6,)
    # verify src/dst match the edge table rows
    et = g.store.edge_table("rel")
    eids = np.asarray(e.edge_ids)
    np.testing.assert_array_equal(np.asarray(e.src_ids), et.src[eids])
    np.testing.assert_array_equal(np.asarray(e.dst_ids), et.dst[eids])


def test_edge_endpoints_and_neg(g):
    seed = g.E("rel").batch(5).shuffle().alias("seed")
    src = seed.outV().alias("src")
    dst = seed.inV().alias("dst")
    src.outNeg("rel").sample(3).by("random").alias("neg")
    q = seed.values()
    ds = gl.Dataset(q, window=1)
    out = ds.next()
    assert out["src"].ids.shape == (5,)
    assert out["dst"].ids.shape == (5,)
    assert out["neg"].ids.shape == (5, 3)
    # endpoint consistency
    np.testing.assert_array_equal(
        np.asarray(out["seed"].src_ids), np.asarray(out["src"].ids))


def test_out_e_hop(g):
    q = (g.V("item").batch(3).alias("src")
         .outE("rel").sample(2).by("random").alias("e1")
         .values())
    out = gl.Dataset(q, window=1).next()
    e = out["e1"]
    assert e.edge_ids.shape == (3, 2)
    assert e.src_nodes.ids.shape == (3, 2)
    # e.src must equal the seed broadcast
    np.testing.assert_array_equal(
        np.asarray(e.src_nodes.ids),
        np.broadcast_to(np.asarray(out["src"].ids)[:, None], (3, 2)))


def test_full_sampler_sparse(g):
    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(10).by("full").alias("nbrs")
         .values())
    out = gl.Dataset(q, window=1).next()
    sp = out["nbrs"]
    assert sp.ids.shape == (4, 10)
    degs = np.asarray(sp.degrees)
    # true degrees for nodes 0..3 are 1 + i%7
    np.testing.assert_array_equal(degs, [1, 2, 3, 4])
    m = np.asarray(sp.mask())
    assert m.sum() == degs.sum()


def test_filter_excludes_positive(g):
    seed = g.E("rel").batch(8).alias("seed")
    src = seed.outV().alias("src")
    dst = seed.inV().alias("dst")
    src.outV("rel").sample(6).by("random").filter("dst").alias("hops")
    out = gl.Dataset(seed.values(), window=1).next()
    hops = np.asarray(out["hops"].ids)
    dstids = np.asarray(out["dst"].ids)
    src_ids = np.asarray(out["src"].ids)
    et = g.store.edge_table("rel")
    dev = et.device()
    ro = np.asarray(dev.out.row_offsets)
    for i in range(8):
        deg = ro[src_ids[i] + 1] - ro[src_ids[i]]
        if deg > 1:  # with >1 neighbors the filter can actually exclude
            assert dstids[i] not in set(hops[i].tolist())


def test_random_walk_query(g):
    q = (g.V("item").batch(4).alias("src")
         .random_walk(5, edge_type="rel").alias("walks")
         .values())
    out = gl.Dataset(q, window=1).next()
    w = out["walks"]
    assert w.ids.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(w.ids)[:, 0], np.arange(4))


def test_subgraph_query(g):
    q = (g.V("item").batch(8).alias("src")
         .SubGraph("rel").alias("sg")
         .values())
    out = gl.Dataset(q, window=1).next()
    sg = out["sg"]
    assert int(sg.num_nodes) == 8
    assert sg.nodes.float_attrs.shape[1] == 4


def test_shuffle_traverse_covers_epoch(g, tmp_graph_dir):
    n = tmp_graph_dir["n"]
    q = g.V("item").batch(7).shuffle(traverse=True).alias("src").values()
    ds = gl.Dataset(q, window=1)
    seen = set()
    try:
        while True:
            out, count = ds.next_with_count()
            seen.update(np.asarray(out["src"].ids)[:count].tolist())
    except OutOfRangeError:
        pass
    assert seen == set(range(n))


def test_neg_node_set(g, tmp_graph_dir):
    """Neg(node_type): pool is the node set, no topology
    (reference gsl/dag_node.py:509-515, NodeFrom.NODE)."""
    n = tmp_graph_dir["n"]
    q = (g.V("item").batch(6).alias("src")
         .Neg("item").sample(4).by("node_weight").alias("neg")
         .values())
    out = gl.Dataset(q, window=1).next()
    neg = out["neg"]
    assert neg.ids.shape == (6, 4)
    assert set(np.asarray(neg.ids).ravel()).issubset(set(range(n)))
    # node_weight draw: weight of node i is i*0.1 -> node 0 (weight 0)
    # should essentially never appear; heavier nodes dominate
    ids = np.asarray(neg.ids).ravel()
    assert ids.mean() > n / 2.5

    q2 = (g.V("item").batch(6).alias("src")
          .Neg("item").sample(3).by("random").alias("neg")
          .values())
    out2 = gl.Dataset(q2, window=1).next()
    assert out2["neg"].ids.shape == (6, 3)


def test_neg_node_set_sampler_api(g, tmp_graph_dir):
    s = g.negative_sampler("item", expand_factor=5, strategy="node_weight")
    res = s.get(np.array([0, 10, 20], np.int64))
    assert res.ids.shape == (3, 5)


def test_v_node_from_edge(g, tmp_graph_dir):
    """V(edge_type, node_from=EDGE_SRC/EDGE_DST) seed spaces
    (reference graph.py:570-574 NodeFrom)."""
    q = (g.V("rel", node_from=gl.NodeFrom.EDGE_SRC).batch(10).alias("s")
         .values())
    out = gl.Dataset(q, window=1).next()
    assert out["s"].ids.shape == (10,)
    # every node 0..39 is a src in the fixture graph
    et = g.store.edge_table("rel")
    src_set = set(np.unique(et.src).tolist())
    assert set(np.asarray(out["s"].ids).tolist()) <= src_set

    # EDGE_DST iterates distinct dst nodes; also accepts the string form
    q2 = g.V("rel", node_from="edge_dst").batch(7).alias("d").values()
    out2 = gl.Dataset(q2, window=1).next()
    dst_set = set(np.unique(et.dst).tolist())
    assert set(np.asarray(out2["d"].ids).tolist()) <= dst_set

    # full epoch covers exactly the distinct src set
    q3 = (g.V("rel", node_from=gl.NodeFrom.EDGE_SRC).batch(7).alias("s")
          .values())
    ds = gl.Dataset(q3, window=1)
    seen = set()
    try:
        while True:
            out, n = ds.next_with_count()
            seen.update(np.asarray(out["s"].ids)[:n].tolist())
    except OutOfRangeError:
        pass
    assert seen == src_set


def test_values_post_func(g):
    """values(func) applies the post-processor (dag_node.py:302)."""
    q = (g.V("item").batch(4).alias("src")
         .values(lambda d: (d["src"].ids, d["src"].float_attrs)))
    ids, fa = gl.Dataset(q, window=1).next()
    assert ids.shape == (4,) and fa.shape == (4, 4)


def test_register_custom_sampler(g):
    """register_sampler extension point (reference REGISTER_OPERATOR,
    docs/en/gl/developer/operator.md:49-104)."""
    import jax.numpy as jnp
    from graph_learn_tpu.ops.sampling import (STRATEGY_FNS, _gather,
                                              register_sampler)
    from graph_learn_tpu.ops.segment import row_bounds_csr

    def first_k(csr, seeds, k, key):
        start, _, deg = row_bounds_csr(csr, seeds)
        ar = jnp.arange(k, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(ar, jnp.maximum(deg, 1)[:, None] - 1)
        return _gather(csr, start[:, None] + idx, (deg > 0)[:, None],
                       start=start)

    if "first_k" not in STRATEGY_FNS:
        register_sampler("first_k", first_k)
    with pytest.raises(Exception):
        register_sampler("random", first_k)  # no overriding built-ins

    q = (g.V("item").batch(5).alias("s")
         .outV("rel").sample(2).by("first_k").alias("h").values())
    out = gl.Dataset(q, window=1).next()
    assert out["h"].ids.shape == (5, 2)
    # deterministic: first entries of the weight-desc adjacency == topk
    q2 = (g.V("item").batch(5).alias("s")
          .outV("rel").sample(2).by("topk").alias("h").values())
    out2 = gl.Dataset(q2, window=1).next()
    np.testing.assert_array_equal(np.asarray(out["h"].ids),
                                  np.asarray(out2["h"].ids))
