"""Host-RAM storage tier: graphs bounded by host memory, not HBM.

``Dataset(q, tier="host")`` keeps every table on the CPU backend (built
under ``jax.default_device(cpu)``), runs the SAME jitted plan there, and
device_puts only the per-batch result pytree to the accelerator — the
out-of-core fallback for single-chip graphs larger than HBM.  This is
the reference's architecture (host-resident MemoryGraphStorage,
core/graph/storage/memory_graph_storage.cc, feeding the accelerator
through the from_generator seam, nn/tf/data/dataset.py:226-241) as a
tier of this framework; the sharded store is the multi-chip alternative.

The 8-virtual-device CPU env (conftest) stands in for {host cpu,
accelerator}: device 0 plays host, any other device plays the chip.
"""

import jax
import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.config import conf


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


def _query(g):
    return (g.V("item").batch(8).shuffle().alias("src")
            .outV("rel").sample(3).by("edge_weight").alias("hop1")
            .outV("rel").sample(2).by("random").alias("hop2").values())


def _leaves(batch):
    return jax.tree.leaves(batch)


def test_host_tier_matches_device_tier(g):
    q = _query(g)
    a = gl.Dataset(q, seed=11).next()
    b = gl.Dataset(q, seed=11, tier="host").next()
    for x, y in zip(_leaves(a), _leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_host_tier_tables_pinned_batches_land_on_accelerator(g):
    host = jax.devices("cpu")[0]
    accel = jax.devices()[2]  # stand-in chip
    q = _query(g)
    ds = gl.Dataset(q, seed=3, tier="host", device=accel)
    # every table leaf is committed to the host device...
    for leaf in jax.tree.leaves(ds._tables):
        assert leaf.devices() == {host}, leaf.devices()
    # ...while every batch leaf lands on the requested accelerator
    batch = ds.next()
    for leaf in _leaves(batch):
        assert leaf.devices() == {accel}, leaf.devices()


def test_host_tier_epochs_and_out_of_range(g):
    # by_order source (plain .shuffle() is the reference's RANDOM
    # generator — never OutOfRange, dag_node.py shuffle(traverse=False))
    q = (g.V("item").batch(8).alias("src")
         .outV("rel").sample(3).by("topk").alias("hop1").values())
    ds = gl.Dataset(q, seed=5, tier="host")
    n = 0
    with pytest.raises(gl.OutOfRangeError):
        while True:
            ds.next()
            n += 1
            assert n < 1000
    size = g.store.node_set("item").size
    assert n == -(-size // 8)
    # epoch restarts after OutOfRange (reference epoch semantics)
    assert ds.next()["src"].ids.shape == (8,)


def test_tier_caches_do_not_leak(g):
    """A host-tier consumer must not poison the device-tier table cache
    (and vice versa): the per-table device views are keyed by the active
    placement (core/store.py _placement_key)."""
    host = jax.devices("cpu")[0]
    q = _query(g)
    ds_host = gl.Dataset(q, seed=1, tier="host")
    dev_tables = q.device_tables()  # built AFTER the host-tier ones
    host_leaves = jax.tree.leaves(ds_host._tables)
    # host-tier leaves are committed to the host device (so jit follows
    # them to the CPU backend); device-tier leaves built afterwards are
    # fresh uncommitted arrays on the default backend, not the cached
    # host-pinned ones
    assert all(l.committed and l.devices() == {host} for l in host_leaves)
    assert not any(l.committed for l in jax.tree.leaves(dev_tables))


def test_placement_key_sees_default_device_context():
    """Direct regression for the semi-internal config read behind the
    tier caches (r4 advisor): ``_placement_key()`` must return a
    DIFFERENT key inside ``jax.default_device(cpu)`` than outside — a
    JAX upgrade that breaks the context-local visibility of
    ``jax.config.jax_default_device`` would collapse the host/device
    cache keys and leak host-pinned tables into device-tier consumers."""
    from graph_learn_tpu.core.store import _placement_key
    outside = _placement_key()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        inside = _placement_key()
    assert inside != outside, (inside, outside)
    assert _placement_key() == outside


def test_bad_tier_rejected(g):
    with pytest.raises(gl.InvalidArgumentError):
        gl.Dataset(_query(g), tier="gpu")


def test_local_trainer_host_tier(tmp_path):
    """End-to-end supervised learning on the host tier: sampling (and the
    out-of-grad deepest-hop pre-reduction) run on the CPU backend from
    host-resident tables; only batches reach the jitted train step.
    Mirrors tests/test_nn.py::test_e2e_supervised_learning on the device
    tier."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import optax
    from data.synthetic import cora_like

    from graph_learn_tpu.nn.data import EgoGraph, pre_aggregate_hop
    from graph_learn_tpu.nn.loss import supervised_softmax_loss
    from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE
    from graph_learn_tpu.nn.trainer import LocalTrainer

    d = str(tmp_path / "cora")
    cora_like(d, n=300, classes=3, feat_dim=16, avg_degree=6, seed=1)
    dec = gl.Decoder(labeled=True, attr_types=["float"] * 16)
    gg = (gl.Graph()
          .node(os.path.join(d, "node_table"), "item", dec)
          .edge(os.path.join(d, "edge_table"), ("item", "item", "rel"),
                gl.Decoder(weighted=True), directed=False)
          .node(os.path.join(d, "train_table"), "item",
                gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
          .node(os.path.join(d, "test_table"), "item",
                gl.Decoder(weighted=True), mask=gl.Mask.TEST)).init()
    q = (gg.V("item", mask=gl.Mask.TRAIN).batch(32).alias("src")
         .outV("rel").sample(5).by("random").alias("hop1")
         .outV("rel").sample(3).by("random").alias("hop2").values())
    model = EgoGraphSAGE([16, 32, 3], dec, agg_type="gcn", dropout=0.0)
    ego0 = EgoGraph.from_query_result(gl.Dataset(q, window=1).next(),
                                      "src", ["hop1", "hop2"])
    params = model.init(jax.random.key(0), ego0, training=False)

    def transform(batch, tables):
        # pre-reduction BEFORE the host->accelerator transfer: the
        # shipped hop2 payload shrinks by the deepest fanout
        return pre_aggregate_hop(
            batch, "hop2", tables["nodes"]["item"].float_attrs, op="mean")

    def loss_fn(model, p, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    tr = LocalTrainer()
    params, hist = tr.train(q, model, params, loss_fn, optax.adam(0.03),
                            epochs=8, verbose=False, tier="host",
                            batch_transform=transform)
    assert hist[-1] < hist[0] * 0.5, hist

    def acc_fn(model, p, batch):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=False)
        return (jax.numpy.argmax(logits, 1)
                == batch["src"].labels).astype(jax.numpy.float32)

    tq = (gg.V("item", mask=gl.Mask.TEST).batch(32).alias("src")
          .outV("rel").sample(5).by("random").alias("hop1")
          .outV("rel").sample(3).by("random").alias("hop2").values())
    acc = tr.evaluate(tq, model, params, acc_fn, tier="host")
    assert acc > 0.6, acc


def test_conf_storage_device_default(g):
    conf.storage_device = "host"
    try:
        ds = gl.Dataset(_query(g), seed=2)
        assert ds.tier == "host"
        host = jax.devices("cpu")[0]
        for leaf in jax.tree.leaves(ds._tables):
            assert leaf.devices() == {host}
        ds.next()
    finally:
        conf.storage_device = "device"
