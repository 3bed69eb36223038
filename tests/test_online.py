"""Streaming updates + installed-query serving (DGS-capability tier)."""

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.online.serving import QueryService
from graph_learn_tpu.online.update import (UpdateBuffer, UpdateLog,
                                           apply_updates)


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


def test_add_edges_visible_after_refresh(g):
    et0 = g.store.edge_table("rel")
    n0 = et0.num_edges
    buf = UpdateBuffer()
    buf.add_edges("rel", src_ids=[0, 0, 0], dst_ids=[390, 380, 370],
                  weights=[9.0, 8.0, 7.0])
    apply_updates(g, buf)
    et1 = g.store.edge_table("rel")
    assert et1.num_edges == n0 + 3
    # node 0 (raw id 0) gained 3 out-neighbors
    deg = g.out_degrees(np.array([0]), "rel")
    assert deg[0] == 1 + 3


def test_add_nodes_then_edges(g):
    n0 = g.store.node_table("item").num_nodes
    buf = UpdateBuffer()
    buf.add_nodes("item", ids=[10_000, 10_010],
                  weights=[1.0, 1.0], labels=[2, 3],
                  float_attrs=np.ones((2, 4), np.float32))
    apply_updates(g, buf)
    t = g.store.node_table("item")
    assert t.num_nodes == n0 + 2
    buf.add_edges("rel", src_ids=[10_000], dst_ids=[10_010], weights=[1.0])
    apply_updates(g, buf)
    assert g.out_degrees(np.array([10_000]), "rel")[0] == 1


def test_duplicate_node_add_rejected(g):
    buf = UpdateBuffer()
    buf.add_nodes("item", ids=[0], weights=[1.0], labels=[0],
                  float_attrs=np.ones((1, 4), np.float32))
    with pytest.raises(gl.InvalidArgumentError):
        apply_updates(g, buf)


def test_update_log_replay(g, tmp_path):
    log = UpdateLog(str(tmp_path / "updates.jsonl"))
    log.append_edges("rel", src_ids=[0], dst_ids=[100], weights=[5.0])
    log.append_edges("rel", src_ids=[10], dst_ids=[200], weights=[5.0])
    buf = UpdateBuffer()
    assert log.replay(buf) == 2
    n0 = g.store.edge_table("rel").num_edges
    apply_updates(g, buf)
    assert g.store.edge_table("rel").num_edges == n0 + 2


def test_query_service_serving(g):
    q = (g.V("item").batch(8).alias("src")
         .outV("rel").sample(3).by("random").alias("h1")
         .outV("rel").sample(2).by("topk").alias("h2").values())
    svc = QueryService(g)
    qid = svc.install(q, micro_batch=8)
    out = svc.run(qid, np.array([0, 10, 20, 30, 40]))
    assert out["src"].ids.shape[0] == 5
    assert out["h1"].ids.shape == (5, 3)
    assert out["h2"].ids.shape == (5, 3, 2)
    # serve again after an update + refresh
    buf = UpdateBuffer()
    buf.add_edges("rel", src_ids=[0] * 5,
                  dst_ids=[100, 110, 120, 130, 140], weights=[9.0] * 5)
    apply_updates(g, buf)
    svc.refresh()
    out2 = svc.run(qid, np.array([0]))
    # node 0 now has 6 out edges; topk hop2 unaffected shape-wise
    assert out2["h1"].ids.shape == (1, 3)
    st = svc.stats(qid)
    assert st["qps"] > 0
