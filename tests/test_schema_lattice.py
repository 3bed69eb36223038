"""Schema-lattice sweep: weighted x labeled x attributed x node/edge.

Parity with the reference's 25-file python test matrix
(reference: graphlearn/python/tests/test_{node,edge}_{weighted,labeled,
attributed}*.py — each generates TSVs for one schema combination, loads a
graph, and asserts payload values round-trip through traversal/lookup/GSL;
shared generators in python/tests/utils.py:27-60).  Here one parametrized
test covers the whole lattice for both node and edge traversal.
"""

import itertools

import numpy as np
import pytest

import graph_learn_tpu as gl

N = 24
DEG = 3
ATTR_DIM = 3


def _write_tables(tmp_path, weighted, labeled, attributed):
    node_cols = ["id:int64"]
    if weighted:
        node_cols.append("weight:float")
    if labeled:
        node_cols.append("label:int64")
    if attributed:
        node_cols.append("feature:string")
    node_path = tmp_path / "nodes"
    with open(node_path, "w") as f:
        f.write("\t".join(node_cols) + "\n")
        for i in range(N):
            row = [str(i * 3)]
            if weighted:
                row.append("%.2f" % (i * 0.5))
            if labeled:
                row.append(str(i % 4))
            if attributed:
                row.append(":".join("%.2f" % (i + j) for j in range(ATTR_DIM)))
            f.write("\t".join(row) + "\n")

    edge_cols = ["src_id:int64", "dst_id:int64"]
    if weighted:
        edge_cols.append("weight:float")
    if labeled:
        edge_cols.append("label:int64")
    if attributed:
        edge_cols.append("feature:string")
    edge_path = tmp_path / "edges"
    edges = []
    with open(edge_path, "w") as f:
        f.write("\t".join(edge_cols) + "\n")
        for i in range(N):
            for j in range(DEG):
                d = (i + j + 1) % N
                row = [str(i * 3), str(d * 3)]
                if weighted:
                    row.append("%.2f" % (i + j * 0.25))
                if labeled:
                    row.append(str((i + j) % 5))
                if attributed:
                    row.append(":".join("%.2f" % (i * j + c)
                                        for c in range(ATTR_DIM)))
                edges.append((i, d, i + j * 0.25, (i + j) % 5))
                f.write("\t".join(row) + "\n")
    return str(node_path), str(edge_path), edges


@pytest.mark.parametrize(
    "weighted,labeled,attributed",
    list(itertools.product([False, True], repeat=3)))
def test_node_edge_schema(tmp_path, weighted, labeled, attributed):
    node_path, edge_path, edges = _write_tables(
        tmp_path, weighted, labeled, attributed)
    attr_types = ["float"] * ATTR_DIM if attributed else None
    ndec = gl.Decoder(weighted=weighted, labeled=labeled,
                      attr_types=attr_types)
    edec = gl.Decoder(weighted=weighted, labeled=labeled,
                      attr_types=attr_types)
    g = (gl.Graph()
         .node(node_path, "v", ndec)
         .edge(edge_path, ("v", "v", "e"), edec)).init()

    # node traversal round-trips every declared field
    out = gl.Dataset(g.V("v").batch(N).alias("n").values(), window=1).next()
    nv = out["n"]
    np.testing.assert_array_equal(np.asarray(nv.raw_ids),
                                  np.arange(N) * 3)
    if weighted:
        np.testing.assert_allclose(np.asarray(nv.weights),
                                   np.arange(N) * 0.5, rtol=1e-6)
    else:
        assert nv.weights is None
    if labeled:
        np.testing.assert_array_equal(np.asarray(nv.labels),
                                      np.arange(N) % 4)
    else:
        assert nv.labels is None
    if attributed:
        assert nv.float_attrs.shape == (N, ATTR_DIM)
        np.testing.assert_allclose(np.asarray(nv.float_attrs)[:, 0],
                                   np.arange(N), rtol=1e-6)
    else:
        assert nv.float_attrs is None

    # edge traversal round-trips payload in file order
    b = 3 * N
    eout = gl.Dataset(g.E("e").batch(b).alias("s").values(), window=1).next()
    ev = eout["s"]
    exp_src = np.array([e[0] for e in edges])
    np.testing.assert_array_equal(np.asarray(ev.src_nodes.raw_ids),
                                  exp_src * 3)
    if weighted:
        np.testing.assert_allclose(np.asarray(ev.weights),
                                   [e[2] for e in edges], rtol=1e-6)
    if labeled:
        np.testing.assert_array_equal(np.asarray(ev.labels),
                                      [e[3] for e in edges])
    if attributed:
        assert ev.float_attrs.shape == (b, ATTR_DIM)

    # weighted graphs support weight-ordered samplers end to end
    strat = "topk" if weighted else "random"
    q = (g.V("v").batch(6).alias("s")
         .outV("e").sample(2).by(strat).alias("h").values())
    hout = gl.Dataset(q, window=1).next()
    assert hout["h"].ids.shape == (6, 2)
    if weighted:
        # topk returns the heaviest neighbor first: weight i+0.5 beats i
        ids = np.asarray(hout["h"].ids)
        np.testing.assert_array_equal(ids[:, 0], (np.arange(6) + 3) % N)
