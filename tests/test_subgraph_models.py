"""SubGraph conv layers, BatchGraph batching, model stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable
from graph_learn_tpu.nn.layers.sub import GATConv, GCNConv, HeteroConv, SAGEConv
from graph_learn_tpu.nn.models.sub_models import (GAT, GCN, GraphSAGE,
                                                  LinkPredictor)
from graph_learn_tpu.nn.subgraph_data import BatchGraph
from graph_learn_tpu.ops.subgraph import induce_batched, induce_subgraph


def _line_graph_ei(n):
    # 0->1->2->...->n-1
    src = jnp.arange(n - 1, dtype=jnp.int32)
    dst = src + 1
    return jnp.stack([src, dst])


def test_sage_conv_mean_math():
    ei = jnp.array([[0, 1, 2], [2, 2, 0]], jnp.int32)  # msgs into node 2, 0
    x = jnp.eye(3, dtype=jnp.float32)
    conv = SAGEConv(in_dim=3, out_dim=3, agg_type="mean")
    p = conv.init(jax.random.key(0), ei, x)
    out = conv.apply(p, ei, x)
    wn = p["params"]["neigh_weights"]["kernel"]
    ws = p["params"]["self_weights"]["kernel"]
    agg2 = (x[0] + x[1]) / 2.0
    expect2 = agg2 @ wn + x[2] @ ws
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(expect2),
                               rtol=1e-5)


def test_sage_conv_edge_mask():
    ei = jnp.array([[0, 1], [2, 2]], jnp.int32)
    x = jnp.eye(3, dtype=jnp.float32)
    conv = SAGEConv(in_dim=3, out_dim=4, agg_type="sum")
    p = conv.init(jax.random.key(0), ei, x)
    full = conv.apply(p, ei, x)
    masked = conv.apply(p, ei, x, edge_mask=jnp.array([True, False]))
    # masking edge 1->2 changes node 2 only
    assert not np.allclose(full[2], masked[2])
    np.testing.assert_allclose(full[0], masked[0])


def test_gcn_conv_shapes_and_self_loop():
    ei = _line_graph_ei(4)
    x = jnp.ones((4, 3))
    conv = GCNConv(in_dim=3, out_dim=5)
    p = conv.init(jax.random.key(0), ei, x)
    out = conv.apply(p, ei, x)
    assert out.shape == (4, 5)
    # isolated node still gets self-loop contribution
    ei0 = jnp.zeros((2, 0), jnp.int32)
    out0 = conv.apply(p, ei0, x)
    assert np.all(np.abs(np.asarray(out0)) > 0)


def test_gat_conv_heads():
    ei = _line_graph_ei(5)
    x = jnp.ones((5, 3))
    for concat in (False, True):
        conv = GATConv(in_dim=3, out_dim=4, num_heads=2, concat=concat)
        p = conv.init(jax.random.key(0), ei, x)
        out = conv.apply(p, ei, x)
        assert out.shape == (5, 8 if concat else 4)


def test_hetero_conv():
    ei_uv = jnp.array([[0, 1], [0, 1]], jnp.int32)
    x_u = jnp.ones((2, 3))
    x_v = jnp.ones((2, 4))
    convs = {"u-v": SAGEConv(in_dim=(3, 4), out_dim=5)}
    hc = HeteroConv(convs=convs)
    p = hc.init(jax.random.key(0), {"u-v": ei_uv}, {"u": x_u, "v": x_v},
                {"u-v": ("u", "v")})
    out = hc.apply(p, {"u-v": ei_uv}, {"u": x_u, "v": x_v},
                   {"u-v": ("u", "v")})
    assert out["v"].shape == (2, 5)


def _toy_csr():
    n = 10
    src, dst = [], []
    for i in range(n):
        for j in range(1 + i % 3):
            src.append(i)
            dst.append((i + j + 1) % n)
    et = EdgeTable("e", "v", "v", Decoder(), src=np.array(src),
                   dst=np.array(dst), num_src_nodes=n, num_dst_nodes=n)
    return et.device()


def test_induce_batched_and_batchgraph():
    dev = _toy_csr()
    seed_sets = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    sg = induce_batched(dev.out, seed_sets, nbr_cap=4)
    assert sg.node_ids.shape == (2, 3)
    bg = BatchGraph.from_subgraphs(sg)
    assert bg.edge_index.shape[0] == 2
    assert bg.num_samples == 2 and bg.node_cap == 3
    # rebased: sample 1's edges land in node slots [3, 6)
    em = np.asarray(bg.edge_mask)
    ei = np.asarray(bg.edge_index)
    n_e0 = int(sg.num_edges[0])
    valid_cols = np.where(em)[0]
    for c in valid_cols:
        in_s0 = ei[0, c] < 3 and ei[1, c] < 3
        in_s1 = 3 <= ei[0, c] < 6 and 3 <= ei[1, c] < 6
        assert in_s0 or in_s1
    # readout shapes
    h = jnp.ones((bg.num_nodes, 4))
    assert bg.readout(h, "mean").shape == (2, 4)
    assert bg.readout(h, "max").shape == (2, 4)


def test_model_stacks_run():
    ei = _line_graph_ei(6)
    x = jnp.ones((6, 4))
    for model in (GraphSAGE([4, 8, 3]), GCN([4, 8, 3]),
                  GAT([4, 8, 3], num_heads=2)):
        p = model.init(jax.random.key(0), ei, x)
        out = model.apply(p, ei, x)
        assert out.shape == (6, 3)


def test_link_predictor():
    lp = LinkPredictor(hidden_dim=8)
    s = jnp.ones((5, 8))
    p = lp.init(jax.random.key(0), s, s)
    out = lp.apply(p, s, s)
    assert out.shape == (5,)


def test_edge_star_inducer():
    """BatchGraph.from_edge_star parity with the reference EdgeInducer
    (examples/tf/sage/edge_inducer.py:29-107): node layout
    [src, dst, src_nbrs, dst_nbrs], bidirectional star edges."""
    from graph_learn_tpu.core.values import Nodes, SparseNodes
    b, ks, kd, d = 3, 4, 2, 5
    src = Nodes(ids=jnp.arange(b, dtype=jnp.int32),
                float_attrs=jnp.ones((b, d)))
    dst = Nodes(ids=jnp.arange(b, dtype=jnp.int32) + 10,
                float_attrs=jnp.full((b, d), 2.0))
    s_nbrs = SparseNodes(ids=jnp.arange(b * ks, dtype=jnp.int32).reshape(b, ks),
                         degrees=jnp.array([4, 2, 0], jnp.int32),
                         float_attrs=jnp.full((b, ks, d), 3.0))
    d_nbrs = SparseNodes(ids=(jnp.arange(b * kd, dtype=jnp.int32) + 50).reshape(b, kd),
                         degrees=jnp.array([2, 1, 2], jnp.int32),
                         float_attrs=jnp.full((b, kd, d), 4.0))
    bg = BatchGraph.from_edge_star(src, dst, s_nbrs, d_nbrs)
    n_cap = 2 + ks + kd
    assert bg.num_samples == 3 and bg.node_cap == n_cap
    nm = np.asarray(bg.node_mask).reshape(b, n_cap)
    # sample 1: 2 anchors + 2 src nbrs + 1 dst nbr valid
    assert nm[1].sum() == 5
    # sample 2: no src nbrs
    assert nm[2].sum() == 4
    em = np.asarray(bg.edge_mask).reshape(b, 2 * (ks + kd))
    assert em[0].sum() == 2 * (4 + 2)
    assert em[2].sum() == 2 * (0 + 2)
    # anchors
    h = jnp.asarray(np.arange(bg.num_nodes, dtype=np.float32))[:, None]
    np.testing.assert_array_equal(
        np.asarray(bg.anchor(h, 0))[:, 0], [0, n_cap, 2 * n_cap])
    # valid edges always touch their sample's anchor slots
    ei = np.asarray(bg.edge_index)
    for c in np.where(np.asarray(bg.edge_mask))[0]:
        s = c // (2 * (ks + kd))
        lo, hi = s * n_cap, (s + 1) * n_cap
        assert lo <= ei[0, c] < hi and lo <= ei[1, c] < hi
        assert ei[0, c] - lo in (0, 1) or ei[1, c] - lo in (0, 1)
    # features concatenated per slot
    fa = np.asarray(bg.nodes.float_attrs).reshape(b, n_cap, d)
    assert np.all(fa[:, 0] == 1.0) and np.all(fa[:, 1] == 2.0)
    assert np.all(fa[:, 2:2 + ks] == 3.0) and np.all(fa[:, 2 + ks:] == 4.0)


def test_hetero_batchgraph_with_heteroconv(tmp_path):
    """HeteroBatchGraph (hetero_batchgraph.py:33-120 parity) feeding
    HeteroConv over a u2i bipartite star batch."""
    import graph_learn_tpu as gl
    from graph_learn_tpu.nn.subgraph_data import HeteroBatchGraph

    d = tmp_path
    with open(d / "u", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(12):
            f.write("%d\t%.1f:%.1f\n" % (i, i, i + 1))
    with open(d / "i", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(8):
            f.write("%d\t%.1f:%.1f:%.1f\n" % (i, 2 * i, i, 1))
    with open(d / "e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\n")
        for u in range(12):
            for j in range(3):
                f.write("%d\t%d\n" % (u, (u + j) % 8))
    g = (gl.Graph()
         .node(str(d / "u"), "u", gl.Decoder(attr_types=["float"] * 2))
         .node(str(d / "i"), "i", gl.Decoder(attr_types=["float"] * 3))
         .edge(str(d / "e"), ("u", "i", "buy"), gl.Decoder())).init()

    b, k = 4, 3
    q = (g.V("u").batch(b).alias("u")
         .outV("buy").sample(k).by("random").alias("items").values())
    out = gl.Dataset(q, window=1).next()
    uv, iv = out["u"], out["items"]

    # per-sample hetero graph: 1 'u' slot + k 'i' slots, edges u->i
    nodes_dict = {
        "u": jax.tree.map(lambda x: x.reshape((b, 1) + x.shape[1:]), uv),
        "i": iv,  # already [b, k, ...]
    }
    node_masks = {"u": jnp.ones((b, 1), bool), "i": jnp.ones((b, k), bool)}
    local = jnp.stack([jnp.zeros((b, k), jnp.int32),
                       jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32),
                                        (b, k))], axis=1)  # [b, 2, k]
    hbg = HeteroBatchGraph.from_samples(
        nodes_dict, node_masks, {"buy": local},
        {"buy": jnp.ones((b, k), bool)}, {"buy": ("u", "i")})

    assert hbg.edge_index["buy"].shape == (2, b * k)
    # every edge's src is a u-slot of the same sample as its dst i-slot
    ei = np.asarray(hbg.edge_index["buy"])
    assert np.all(ei[0] // 1 == np.asarray(hbg.graph_ids["i"])[ei[1]])

    # run a HeteroConv stack over it
    from graph_learn_tpu.nn.layers.sub import HeteroConv, SAGEConv
    conv = HeteroConv(convs={"buy": SAGEConv(in_dim=(2, 3), out_dim=4)})
    x = {"u": hbg.nodes["u"].float_attrs, "i": hbg.nodes["i"].float_attrs}
    params = conv.init(jax.random.key(0), hbg.edge_index, x, hbg.topology,
                       hbg.edge_mask)
    h = conv.apply(params, hbg.edge_index, x, hbg.topology, hbg.edge_mask)
    assert h["i"].shape == (b * k, 4)
    # per-sample readout of item embeddings
    pooled = hbg.readout(h["i"], "i")
    assert pooled.shape == (b, 4)
    # anchor: sample's u slot 0
    assert hbg.anchor(x["u"], "u", 0).shape == (b, 2)
