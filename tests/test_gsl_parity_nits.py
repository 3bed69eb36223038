"""GSL parity batch (VERDICT round-1 Missing #7/#8, Weak #5/#6):

- .filter() on EVERY sampling strategy (reference Filter::ActOn removes
  the hit neighbor before selection, sampler/filter.cc, used by
  topk/edge_weight/in_degree/WOR/full samplers alike);
- Nodes.out_degrees auto-populated per hop (reference DegreeDagNode,
  gsl/dag_node.py:71-79);
- multiple sources merged into one node type (reference
  python/graph.py:200-242);
- .each() branching query shape (reference dag_node.py:294, u2i
  examples / examples/basic/query_examples.py:20-80).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable
from graph_learn_tpu.ops.sampling import (SampleFilter, full_sample,
                                          topk_sample, uniform_sample,
                                          weighted_sample,
                                          without_replacement_sample)


def _wtable(n=12, deg=6):
    """node i -> (i+j+1)%n with weight j+1 (adjacency sorted weight-desc)."""
    src, dst, w = [], [], []
    for i in range(n):
        for j in range(deg):
            src.append(i)
            dst.append((i + j + 1) % n)
            w.append(float(j + 1))
    return EdgeTable("e", "v", "v", Decoder(weighted=True),
                     src=np.array(src), dst=np.array(dst),
                     num_src_nodes=n, num_dst_nodes=n,
                     weights=np.array(w, np.float32))


def _excl_filter(n, seeds, et):
    """Exclude each seed's FIRST adjacency neighbor (weight-desc order)."""
    dev = et.device()
    ro = np.asarray(dev.out.row_offsets)
    nbr = np.asarray(dev.out.nbr_ids)
    excl = np.array([nbr[ro[s]] for s in np.asarray(seeds)], np.int32)
    return SampleFilter(exclude_dst=jnp.asarray(excl)), excl


def test_topk_filter_skips_excluded():
    et = _wtable()
    dev = et.device()
    seeds = jnp.arange(12, dtype=jnp.int32)
    flt, excl = _excl_filter(12, seeds, et)
    ids, eids = topk_sample(dev.out, seeds, 3, flt=flt)
    ids = np.asarray(ids)
    assert not np.any(ids == excl[:, None])
    # filtered top-k == unfiltered positions 1..3 (excluded was rank 0)
    ids_all, _ = topk_sample(dev.out, seeds, 4)
    np.testing.assert_array_equal(ids, np.asarray(ids_all)[:, 1:4])


def test_weighted_filter_exact_renormalization():
    et = _wtable()
    dev = et.device()
    b = 6000
    seeds = jnp.zeros((b,), jnp.int32)
    flt, excl = _excl_filter(12, seeds[:1], et)
    flt = SampleFilter(exclude_dst=jnp.broadcast_to(flt.exclude_dst, (b,)))
    ids, eids = weighted_sample(dev.out, seeds, 2, jax.random.key(0),
                                flt=flt)
    ids = np.asarray(ids).ravel()
    assert not np.any(ids == int(excl[0]))
    # remaining mass: weights 1..5 (6 excluded); freq ~ w / 15
    w_of = np.asarray(et.weights)
    eidsf = np.asarray(eids).ravel()
    got_w = w_of[eidsf]
    freq = np.bincount(got_w.astype(int), minlength=7)[1:6] / eidsf.size
    np.testing.assert_allclose(freq, np.arange(1, 6) / 15.0, atol=0.03)


def test_wor_filter_distinct_and_excluded():
    et = _wtable()
    dev = et.device()
    b = 400
    seeds = jnp.full((b,), 3, jnp.int32)
    flt, excl = _excl_filter(12, seeds[:1], et)
    flt = SampleFilter(exclude_dst=jnp.broadcast_to(flt.exclude_dst, (b,)))
    ids, eids = without_replacement_sample(dev.out, seeds, 4,
                                           jax.random.key(1), flt=flt)
    ids = np.asarray(ids)
    assert not np.any(ids == int(excl[0]))
    for row in ids:
        assert len(set(row.tolist())) == 4  # filtered degree 5 > k=4
    # deg-after-filter <= k returns all remaining neighbors
    ids2, _ = without_replacement_sample(dev.out, seeds[:4], 5,
                                         jax.random.key(2), flt=SampleFilter(
                                             exclude_dst=flt.exclude_dst[:4]))
    for row in np.asarray(ids2):
        assert int(excl[0]) not in row


def test_full_filter_compacts():
    et = _wtable()
    dev = et.device()
    seeds = jnp.arange(12, dtype=jnp.int32)
    flt, excl = _excl_filter(12, seeds, et)
    ids, eids, degs = full_sample(dev.out, seeds, 10, flt=flt)
    assert np.all(np.asarray(degs) == 5)  # 6 neighbors - 1 excluded
    ids = np.asarray(ids)
    for i in range(12):
        row = ids[i][:5]
        assert excl[i] not in row


def test_gsl_filter_on_topk_end_to_end(tmp_path):
    d = str(tmp_path)
    with open(d + "/n", "w") as f:
        f.write("id:int64\n")
        for i in range(10):
            f.write("%d\n" % i)
    with open(d + "/e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(10):
            for j in range(4):
                f.write("%d\t%d\t%f\n" % (i, (i + j + 1) % 10, j + 1.0))
    g = (gl.Graph().node(d + "/n", "v", gl.Decoder())
         .edge(d + "/e", ("v", "v", "e"), gl.Decoder(weighted=True))).init()
    q = (g.E("e").batch(10).alias("seed")
         .outV().alias("src"))
    dst = g.E("e").batch(10)  # unused: just checking builder reuse is safe
    seed = q.dag.get_node("seed")
    h = (q.outV("e").sample(3).by("topk").filter("dst").alias("h1"))
    # register dst alias: the seed edges' dst view
    g2 = None
    # simpler: build the canonical unsupervised shape in one chain
    q2 = (g.E("e").batch(10).alias("seed2"))
    srcn = q2.outV().alias("src2")
    dstn = q2.inV().alias("dst2")
    h2 = srcn.outV("e").sample(3).by("topk").filter("dst2").alias("h12")
    out = gl.Dataset(q2.values(), window=1).next()
    dst_ids = np.asarray(out["dst2"].ids)
    got = np.asarray(out["h12"].ids)
    assert not np.any(got == dst_ids[:, None])


def test_out_degrees_populated_per_hop(tmp_path):
    d = str(tmp_path)
    with open(d + "/n", "w") as f:
        f.write("id:int64\n")
        for i in range(8):
            f.write("%d\n" % i)
    with open(d + "/e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\n")
        for i in range(8):
            for j in range(1 + i % 3):  # degree 1..3
                f.write("%d\t%d\n" % (i, (i + j + 1) % 8))
    g = (gl.Graph().node(d + "/n", "v", gl.Decoder())
         .edge(d + "/e", ("v", "v", "e"), gl.Decoder())).init()
    q = (g.V("v").batch(8).alias("src")
         .outV("e").sample(2).by("random").alias("h1")
         .outV("e").sample(2).by("random").alias("h2").values())
    out = gl.Dataset(q, window=1).next()
    degs = np.asarray(out["src"].out_degrees)
    expect = np.array([1 + i % 3 for i in range(8)])
    np.testing.assert_array_equal(degs, expect)
    # hop nodes get their own degrees too (they hop again to h2)
    h1_deg = np.asarray(out["h1"].out_degrees)
    h1_ids = np.asarray(out["h1"].ids)
    np.testing.assert_array_equal(h1_deg, expect[h1_ids])


def test_multiple_node_sources_merge(tmp_path):
    d = str(tmp_path)
    for part, rng in (("a", range(0, 5)), ("b", range(5, 9))):
        with open(d + "/n_%s" % part, "w") as f:
            f.write("id:int64\tlabel:int64\tfeature:string\n")
            for i in rng:
                f.write("%d\t%d\t%.1f:%.1f\n" % (i, i % 2, i, i * 2))
    with open(d + "/e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\n")
        for i in range(9):
            f.write("%d\t%d\n" % (i, (i + 1) % 9))
    dec = gl.Decoder(labeled=True, attr_types=["float"] * 2)
    # comma-separated form (reference python/graph.py:200 accepts lists)
    g = (gl.Graph().node(d + "/n_a," + d + "/n_b", "v", dec)
         .edge(d + "/e", ("v", "v", "e"), gl.Decoder())).init()
    assert g.get_stats()["nodes"]["v"] == 9
    out = gl.Dataset(
        g.V("v").batch(9).alias("s").values(), window=1).next()
    feats = np.asarray(out["s"].float_attrs)
    np.testing.assert_allclose(feats[:, 0], np.arange(9), atol=1e-5)
    # duplicate ids across sources raise loudly
    g2 = (gl.Graph().node(d + "/n_a," + d + "/n_a", "v2", dec)
          .edge(d + "/e", ("v2", "v2", "e2"), gl.Decoder()))
    with pytest.raises(Exception):
        g2.init()


def test_each_branching_query(tmp_path):
    """The u2i branching shape: one seed fans into src and dst towers via
    .each() (reference dag_node.py:294 + query_examples.py:20-80)."""
    d = str(tmp_path)
    with open(d + "/u", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(6):
            f.write("%d\t%.1f\n" % (i, i))
    with open(d + "/i", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(8):
            f.write("%d\t%.1f\n" % (i, i * 10))
    with open(d + "/ui", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for u in range(6):
            for j in range(3):
                f.write("%d\t%d\t1.0\n" % (u, (u + j) % 8))
    with open(d + "/ii", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(8):
            f.write("%d\t%d\t1.0\n" % (i, (i + 1) % 8))
    g = (gl.Graph()
         .node(d + "/u", "u", gl.Decoder(attr_types=["float"]))
         .node(d + "/i", "i", gl.Decoder(attr_types=["float"]))
         .edge(d + "/ui", ("u", "i", "u-i"), gl.Decoder(weighted=True))
         .edge(d + "/ii", ("i", "i", "i-i"), gl.Decoder(weighted=True))).init()

    def branch(edges):
        src = edges.outV().alias("src")
        dst = edges.inV().alias("dst")
        src.outV("u-i").sample(2).by("random").alias("src_1hop")
        dst.outV("i-i").sample(2).by("random").alias("dst_1hop")

    q = g.E("u-i").batch(4).alias("seed").each(branch).values()
    out = gl.Dataset(q, window=1).next()
    assert set(out) >= {"seed", "src", "dst", "src_1hop", "dst_1hop"}
    assert out["src_1hop"].ids.shape == (4, 2)
    assert out["dst_1hop"].ids.shape == (4, 2)
    # src tower sampled items, dst tower sampled items-of-items
    np.testing.assert_array_equal(np.asarray(out["src"].ids),
                                  np.asarray(out["seed"].src_nodes.ids))
