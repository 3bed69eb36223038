"""nn layer tests: feature columns, convs, models, losses, E2E learning."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import graph_learn_tpu as gl
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.values import Nodes
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.feature_column import FeatureEncoder
from graph_learn_tpu.nn.layers.ego import (EgoGATConv, EgoGINConv, EgoLayer,
                                           EgoRGCNConv, EgoSAGEConv)
from graph_learn_tpu.nn.loss import (sigmoid_cross_entropy_loss,
                                     supervised_softmax_loss,
                                     triplet_margin_loss,
                                     unsupervised_softmax_cross_entropy_loss)
from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE, EgoGAT
from graph_learn_tpu.nn.trainer import LocalTrainer


def test_feature_encoder_numeric_plus_embedding():
    dec = Decoder(attr_types=["float", "float", ("string", 50)],
                  attr_dims=[None, None, 8])
    nodes = Nodes(ids=jnp.arange(4),
                  float_attrs=jnp.ones((4, 2)),
                  int_attrs=jnp.array([[3], [7], [3], [49]]))
    enc = FeatureEncoder(dec)
    params = enc.init(jax.random.key(0), nodes)
    out = enc.apply(params, nodes)
    assert out.shape == (4, 2 + 8)
    # same id -> same embedding rows
    np.testing.assert_allclose(out[0, 2:], out[2, 2:])


def test_feature_encoder_multival():
    dec = Decoder(attr_types=[("string", 20, True)], attr_dims=[4])
    nodes = Nodes(ids=jnp.arange(2),
                  multival_attrs=jnp.array([[[1, 2, 0]], [[5, 0, 0]]]),
                  multival_lens=jnp.array([[2], [1]]))
    enc = FeatureEncoder(dec)
    params = enc.init(jax.random.key(0), nodes)
    out = enc.apply(params, nodes)
    assert out.shape == (2, 4)


def test_ego_sage_conv_agg_types():
    x = jnp.ones((3, 4))
    nbr = jnp.arange(3 * 2 * 4, dtype=jnp.float32).reshape(6, 4)
    for agg in ("mean", "sum", "max", "gcn"):
        conv = EgoSAGEConv(in_dim=4, out_dim=5, agg_type=agg)
        p = conv.init(jax.random.key(0), x, nbr, 2)
        out = conv.apply(p, x, nbr, 2)
        assert out.shape == (3, 5)
    # mean agg parity: manual computation
    conv = EgoSAGEConv(in_dim=4, out_dim=5, agg_type="mean")
    p = conv.init(jax.random.key(1), x, nbr, 2)
    out = conv.apply(p, x, nbr, 2)
    w = p["params"]["trans_nodes"]["kernel"]
    agg = nbr.reshape(3, 2, 4).mean(axis=1)
    expect = jnp.concatenate([x, agg], axis=1) @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_ego_gat_conv():
    x = jnp.ones((3, 4))
    nbr = jnp.ones((6, 4))
    conv = EgoGATConv(in_dim=4, out_dim=5, num_head=3)
    p = conv.init(jax.random.key(0), x, nbr, 2)
    out = conv.apply(p, x, nbr, 2)
    assert out.shape == (3, 5)


def test_ego_gat_chunked_matches_unchunked():
    """The lax.map seed-chunked neighbor block (incl. ragged padding and
    the checkpointed backward) is exact vs the single-chunk path."""
    rng = np.random.default_rng(3)
    b, e, din, dout, H = 21, 4, 6, 5, 2  # 21 % chunk(8) != 0: pads
    x = jnp.asarray(rng.standard_normal((b, din)), jnp.float32)
    nbr = jnp.asarray(rng.standard_normal((b * e, din)), jnp.float32)
    full = EgoGATConv(in_dim=din, out_dim=dout, num_head=H, seed_chunk=0)
    chunk = EgoGATConv(in_dim=din, out_dim=dout, num_head=H, seed_chunk=8)
    p = full.init(jax.random.key(0), x, nbr, e)
    np.testing.assert_allclose(np.asarray(full.apply(p, x, nbr, e)),
                               np.asarray(chunk.apply(p, x, nbr, e)),
                               rtol=1e-5, atol=1e-5)
    gf = jax.grad(lambda pp: full.apply(pp, x, nbr, e).sum())(p)
    gc = jax.grad(lambda pp: chunk.apply(pp, x, nbr, e).sum())(p)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5), gf, gc)
    # hetero dims + bias + dropout path also runs chunked
    het = EgoGATConv(in_dim=(din, din + 1), out_dim=dout, num_head=H,
                     use_bias=True, attn_dropout=0.5, seed_chunk=8)
    nbr2 = jnp.asarray(rng.standard_normal((b * e, din + 1)), jnp.float32)
    p2 = het.init({"params": jax.random.key(1),
                   "dropout": jax.random.key(2)}, x, nbr2, e, training=True)
    out = het.apply(p2, x, nbr2, e, training=True,
                    rngs={"dropout": jax.random.key(3)})
    assert out.shape == (b, dout) and bool(jnp.isfinite(out).all())


def test_ego_gin_conv():
    x = jnp.ones((3, 4))
    nbr = jnp.ones((6, 4))
    conv = EgoGINConv(in_dim=4, out_dim=5, eps=0.1)
    p = conv.init(jax.random.key(0), x, nbr, 2)
    assert conv.apply(p, x, nbr, 2).shape == (3, 5)


def test_ego_rgcn_conv_decompositions():
    x = jnp.ones((3, 4))
    nbrs = [jnp.ones((6, 4)), jnp.ones((6, 4))]
    for kw in ({}, {"num_bases": 2}, {"num_blocks": 2}):
        conv = EgoRGCNConv(in_dim=4, out_dim=6, num_relations=2, **kw)
        p = conv.init(jax.random.key(0), x, nbrs, 2)
        out = conv.apply(p, x, nbrs, 2)
        assert out.shape == (3, 6), kw
    # weight shapes parity (ego_rgcn_conv.py:85-101)
    conv = EgoRGCNConv(in_dim=4, out_dim=6, num_relations=2, num_bases=3)
    p = conv.init(jax.random.key(0), x, nbrs, 2)
    assert p["params"]["weight"].shape == (3, 4, 6)
    assert p["params"]["coefficient"].shape == (2, 3)
    conv = EgoRGCNConv(in_dim=4, out_dim=6, num_relations=2, num_blocks=2)
    p = conv.init(jax.random.key(0), x, nbrs, 2)
    assert p["params"]["weight"].shape == (2, 2, 2, 3)


def test_ego_layer_param_sharing():
    conv = EgoSAGEConv(in_dim=4, out_dim=4, agg_type="mean")
    layer = EgoLayer(convs=[conv] * 2)
    x_list = [jnp.ones((2, 4)), jnp.ones((4, 4)), jnp.ones((8, 4))]
    p = layer.init(jax.random.key(0), x_list, [2, 2])
    out = layer.apply(p, x_list, [2, 2])
    assert len(out) == 2
    assert out[0].shape == (2, 4) and out[1].shape == (4, 4)
    # single conv params (shared)
    flat = jax.tree_util.tree_leaves(p)
    assert len(jax.tree_util.tree_structure(p).unflatten(flat)["params"]) == 1


def test_losses():
    k = jax.random.key(0)
    logits = jax.random.normal(k, (8, 5))
    labels = jnp.arange(8) % 5
    l1 = supervised_softmax_loss(logits, labels)
    assert l1.shape == ()
    l2 = sigmoid_cross_entropy_loss(jnp.ones(4), -jnp.ones(4))
    assert float(l2) < 2 * 0.35
    src = jax.random.normal(k, (4, 8))
    l3 = unsupervised_softmax_cross_entropy_loss(src, src, -src)
    assert float(l3) < 1.0  # pos sim >> neg sim
    l4 = triplet_margin_loss(src, src, src, src, src, src + 1.0,
                             margin=0.5, neg_num=1)
    assert l4.shape == ()


def _toy_supervised(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from data.synthetic import cora_like
    d = str(tmp_path / "cora")
    cora_like(d, n=300, classes=3, feat_dim=16, avg_degree=6, seed=1)
    dec = gl.Decoder(labeled=True, attr_types=["float"] * 16)
    g = (gl.Graph()
         .node(os.path.join(d, "node_table"), "item", dec)
         .edge(os.path.join(d, "edge_table"), ("item", "item", "rel"),
               gl.Decoder(weighted=True), directed=False)
         .node(os.path.join(d, "train_table"), "item",
               gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
         .node(os.path.join(d, "test_table"), "item",
               gl.Decoder(weighted=True), mask=gl.Mask.TEST)).init()
    return g, dec


def test_e2e_supervised_learning(tmp_path):
    """Fused sample+train step learns on a homophilous planted graph."""
    g, dec = _toy_supervised(tmp_path)
    q = (g.V("item", mask=gl.Mask.TRAIN).batch(32).alias("src")
         .outV("rel").sample(5).by("random").alias("hop1")
         .outV("rel").sample(3).by("random").alias("hop2").values())
    model = EgoGraphSAGE([16, 32, 3], dec, agg_type="gcn", dropout=0.0)
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    ego0 = EgoGraph.from_query_result(b0, "src", ["hop1", "hop2"])
    params = model.init(jax.random.key(0), ego0, training=False)

    def loss_fn(model, p, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    tr = LocalTrainer()
    params, hist = tr.train(q, model, params, loss_fn, optax.adam(0.03),
                            epochs=8, verbose=False)
    assert hist[-1] < hist[0] * 0.5, hist

    def acc_fn(model, p, batch):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=False)
        return (jnp.argmax(logits, 1) == batch["src"].labels).astype(jnp.float32)

    tq = (g.V("item", mask=gl.Mask.TEST).batch(32).alias("src")
          .outV("rel").sample(5).by("random").alias("hop1")
          .outV("rel").sample(3).by("random").alias("hop2").values())
    acc = tr.evaluate(tq, model, params, acc_fn)
    assert acc > 0.6, acc


def test_trainer_batch_transform_pre_aggregate(tmp_path):
    """pre_aggregate_hop via LocalTrainer(batch_transform=...) learns the
    same task and evaluates equal to the plain path (out-of-grad
    deepest-hop reduction, PERF.md 'the frontier moved')."""
    from graph_learn_tpu.nn.data import pre_aggregate_hop

    g, dec = _toy_supervised(tmp_path)
    q = (g.V("item", mask=gl.Mask.TRAIN).batch(32).alias("src")
         .outV("rel").sample(5).by("random").alias("hop1")
         .outV("rel").sample(3).by("random").alias("hop2").values())
    model = EgoGraphSAGE([16, 32, 3], dec, agg_type="gcn", dropout=0.0)
    ds = gl.Dataset(q, window=1)
    ego0 = EgoGraph.from_query_result(ds.next(), "src", ["hop1", "hop2"])
    params = model.init(jax.random.key(0), ego0, training=False)

    def transform(batch, tables):
        return pre_aggregate_hop(
            batch, "hop2", tables["nodes"]["item"].float_attrs, op="mean")

    def loss_fn(model, p, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    tr = LocalTrainer()
    params, hist = tr.train(q, model, params, loss_fn, optax.adam(0.03),
                            epochs=8, verbose=False,
                            batch_transform=transform)
    assert hist[-1] < hist[0] * 0.5, hist

    def acc_fn(model, p, batch):
        ego = EgoGraph.from_query_result(batch, "src", ["hop1", "hop2"])
        logits = model.apply(p, ego, training=False)
        return (jnp.argmax(logits, 1) == batch["src"].labels).astype(jnp.float32)

    tq = (g.V("item", mask=gl.Mask.TEST).batch(32).alias("src")
          .outV("rel").sample(5).by("random").alias("hop1")
          .outV("rel").sample(3).by("random").alias("hop2").values())
    # same params, same seeds: transformed eval == plain eval (the affine
    # float encoder commutes with mean up to float rounding)
    acc_pre = tr.evaluate(tq, model, params, acc_fn,
                          batch_transform=transform)
    acc_plain = tr.evaluate(tq, model, params, acc_fn)
    assert abs(acc_pre - acc_plain) < 1e-6, (acc_pre, acc_plain)
    assert acc_pre > 0.6, acc_pre
