"""Degenerate-input robustness: empty adjacency, tiny tables, big batch.

The reference handles these via FillWith defaults + Status errors
(res->FillWith(DefaultNeighborId,-1), random_sampler.cc; OutOfRange on
exhausted epochs).  Shape-static TPU plans must stay well-defined too.
"""

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.errors import OutOfRangeError


def _write(tmp_path, n_nodes, edges):
    with open(tmp_path / "n", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(n_nodes):
            f.write("%d\t%.1f\n" % (i, i))
    with open(tmp_path / "e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for s, d, w in edges:
            f.write("%d\t%d\t%.1f\n" % (s, d, w))
    g = (gl.Graph()
         .node(str(tmp_path / "n"), "v", gl.Decoder(attr_types=["float"]))
         .edge(str(tmp_path / "e"), ("v", "v", "e"),
               gl.Decoder(weighted=True))).init()
    return g


def test_zero_edge_graph(tmp_path):
    g = _write(tmp_path, 5, [])
    for strat in ("random", "topk", "edge_weight", "full"):
        q = (g.V("v").batch(5).alias("s")
             .outV("e").sample(2).by(strat).alias("h").values())
        out = gl.Dataset(q, window=1).next()
        ids = np.asarray(out["h"].ids)
        assert ids.shape[0] == 5
        # default fill everywhere (no neighbors exist at all)
        assert np.all(ids == gl.conf.default_neighbor_id)


def test_single_node_self_loop(tmp_path):
    g = _write(tmp_path, 1, [(0, 0, 1.0)])
    q = (g.V("v").batch(1).alias("s")
         .outV("e").sample(3).by("random").alias("h").values())
    out = gl.Dataset(q, window=1).next()
    np.testing.assert_array_equal(np.asarray(out["h"].ids), [[0, 0, 0]])
    # negatives from a 1-node pool
    q2 = (g.V("v").batch(1).alias("s")
          .outNeg("e").sample(2).by("random").alias("n").values())
    out2 = gl.Dataset(q2, window=1).next()
    assert out2["n"].ids.shape == (1, 2)


def test_batch_larger_than_table(tmp_path):
    g = _write(tmp_path, 3, [(0, 1, 1.0), (1, 2, 1.0)])
    ds = gl.Dataset(g.V("v").batch(10).alias("s").values(), window=1)
    out, count = ds.next_with_count()
    assert count == 3
    assert out["s"].ids.shape == (10,)  # circularly padded
    with pytest.raises(OutOfRangeError):
        ds.next_with_count()
    # epoch restarts after OutOfRange (reference generator semantics)
    out2, count2 = ds.next_with_count()
    assert count2 == 3


def test_walk_on_dead_ends(tmp_path):
    # chain 0->1->2, node 2 is a dead end: walk pads with -1 sentinels
    g = _write(tmp_path, 3, [(0, 1, 1.0), (1, 2, 1.0)])
    q = (g.V("v").batch(3).alias("s")
         .random_walk(4, edge_type="e").alias("w").values())
    w = np.asarray(gl.Dataset(q, window=1).next()["w"].ids)
    assert w.shape == (3, 4)
    # row starting at node 2 can never move: every later step is sentinel
    assert np.all(w[2, 1:] == -1)


def test_subgraph_on_isolated_seeds(tmp_path):
    g = _write(tmp_path, 4, [(0, 1, 1.0)])
    q = (g.V("v").batch(4).alias("s").SubGraph("e").alias("sg").values())
    sg = gl.Dataset(q, window=1).next()["sg"]
    assert int(sg.num_nodes) == 4  # seeds themselves always present
