"""Non-GSL sampler API, checkpointing, profiling."""

import numpy as np
import jax
import jax.numpy as jnp
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
    return g.init()


def test_node_sampler(g, tmp_graph_dir):
    s = g.node_sampler("item", batch_size=8)
    nodes = s.get()
    assert nodes.ids.shape == (8,)
    np.testing.assert_array_equal(np.asarray(nodes.raw_ids),
                                  np.arange(8) * 10)


def test_edge_sampler(g):
    s = g.edge_sampler("rel", batch_size=6, strategy="shuffle")
    e = s.get()
    assert e.edge_ids.shape == (6,)
    assert e.src_nodes.float_attrs.shape == (6, 4)


def test_neighbor_sampler_multihop(g):
    s = g.neighbor_sampler("rel", [3, 2], strategy="topk")
    hops = s.get(np.array([10, 30, 50]))
    assert hops[0].ids.shape == (3, 3)
    assert hops[1].ids.shape == (3, 3, 2)


def test_neighbor_sampler_full(g):
    s = g.neighbor_sampler("rel", [5], strategy="full")
    hops = s.get(np.array([30, 60]))
    sp = hops[0]
    assert sp.ids.shape == (2, 5)
    # node 3 (raw 30) has degree 4, node 6 (raw 60) has degree 7 -> clipped 5
    np.testing.assert_array_equal(np.asarray(sp.degrees), [4, 5])


def test_negative_sampler(g):
    s = g.negative_sampler("rel", 6, strategy="in_degree")
    neg = s.get(np.array([10, 20]))
    assert neg.ids.shape == (2, 6)


def test_subgraph_sampler(g):
    s = g.subgraph_sampler("item", "rel", num_nbrs=[10])
    sg = s.get(np.array([0, 10, 20, 30]))
    assert int(sg.num_nodes) == 4


def test_random_walk_sampler(g):
    s = g.random_walk_sampler("rel", walk_len=4)
    w = s.get(np.array([30, 50]))
    assert w.shape == (2, 4)


def test_checkpointer(tmp_path):
    from graph_learn_tpu.nn.checkpoint import Checkpointer
    state = {"params": {"w": jnp.ones((4, 4))}, "step": jnp.int32(7)}
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(7, state)
    assert ck.latest_step() == 7
    template = jax.tree.map(np.zeros_like, state)
    restored = ck.restore(template)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.0)


def test_profiling_scope(capsys):
    from graph_learn_tpu.utils import profiling as prof
    with prof.profiling("test_key"):
        _ = sum(range(1000))
    prof.dump()
    out = capsys.readouterr().out
    assert "test_key" in out and "count" in out


def test_torch_bridge(g):
    """GSL -> torch IterableDataset/DataLoader (reference nn/pytorch)."""
    torch = pytest.importorskip("torch")
    from graph_learn_tpu.nn.torch_bridge import (TorchDataset, torch_loader,
                                                 value_to_torch)
    q = (g.V("item").batch(8).alias("src")
         .outV("rel").sample(3).by("random").alias("hop")
         .values())
    batches = list(TorchDataset(q, window=1))
    assert len(batches) >= 1
    b0 = batches[0]
    assert isinstance(b0["src"]["ids"], torch.Tensor)
    assert b0["hop"]["ids"].shape == (8, 3)
    assert b0["src"]["float_attrs"].dtype in (torch.float32, torch.float64)

    # induce_func contract: dict -> custom object
    def induce(batch):
        return (batch["src"].ids.shape[0], batch["hop"].ids.shape)
    out = next(iter(torch_loader(q, window=1, induce_func=induce)))
    assert out == (8, (8, 3))


def test_torch_bridge_host_tier_stays_on_host(g):
    """TorchDataset(tier='host'): the graph is host-resident AND batches
    stay pinned to the host CPU device (torch copies to CPU anyway — the
    accelerator round-trip is skipped for this bridge)."""
    torch = pytest.importorskip("torch")
    import jax

    from graph_learn_tpu.nn.torch_bridge import TorchDataset
    q = (g.V("item").batch(8).alias("src")
         .outV("rel").sample(3).by("topk").alias("hop")
         .values())
    host = list(TorchDataset(q, window=1, tier="host"))
    dev = list(TorchDataset(q, window=1))
    assert len(host) == len(dev)
    # deterministic (topk + by_order): tiers agree exactly
    assert torch.equal(host[0]["hop"]["ids"], dev[0]["hop"]["ids"])
    assert isinstance(host[0]["src"]["ids"], torch.Tensor)


def test_torch_bridge_trims_partial_batch(g):
    """Final partial batch must not leak padded rows (review regression)."""
    pytest.importorskip("torch")
    from graph_learn_tpu.nn.torch_bridge import TorchDataset
    # 40 nodes, batch 16 -> batches of 16, 16, 8
    q = g.V("item").batch(16).alias("src").values()
    sizes = [b["src"]["ids"].shape[0] for b in TorchDataset(q, window=1)]
    assert sizes == [16, 16, 8]
