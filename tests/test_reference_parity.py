"""Activation parity: our JAX layers vs the reference's own TF code.

Runs the reference layer implementations (loaded read-only from
/root/reference via tests/ref_loader.py) in TF1 graph mode with the SAME
weights and inputs as our flax layers, asserting allclose — the
BASELINE.json per-layer parity requirement.
"""

import numpy as np
import pytest

tf_mod = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from ref_loader import load_reference_layers

REF = load_reference_layers()

import tensorflow.compat.v1 as tf1

tf1.disable_v2_behavior()
tf1.disable_eager_execution()


def _run_tf(build_fn, feeds=None):
    """Build + run a reference graph in a fresh TF1 session."""
    with tf1.Graph().as_default():
        out, assigns = build_fn()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            if assigns:
                sess.run(assigns)
            return sess.run(out, feed_dict=feeds or {})


def _assign_all(values):
    """Create assign ops for name->np.array over current TF variables."""
    ops = []
    for v in tf1.global_variables():
        key = v.op.name
        if key in values:
            ops.append(tf1.assign(v, values[key]))
    return ops


rng = np.random.default_rng(0)


@pytest.mark.parametrize("agg", ["mean", "sum", "max", "gcn"])
def test_ego_sage_conv_parity(agg):
    b, e, din, dout = 6, 4, 8, 5
    x = rng.standard_normal((b, din)).astype(np.float32)
    nbr = rng.standard_normal((b * e, din)).astype(np.float32)
    w_dim = din if agg == "gcn" else 2 * din
    w = rng.standard_normal((w_dim, dout)).astype(np.float32)

    def build():
        conv = REF["ego_sage_conv"].EgoSAGEConv(
            "t", in_dim=din, out_dim=dout, agg_type=agg)
        out = conv.forward(tf1.constant(x), tf1.constant(nbr), e)
        return out, _assign_all({"ego_sage_layer_t/trans_nodes/weights": w})

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.ego import EgoSAGEConv
    ours = EgoSAGEConv(in_dim=din, out_dim=dout, agg_type=agg)
    params = {"params": {"trans_nodes": {"kernel": jnp.asarray(w)}}}
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(nbr), e))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ego_gin_conv_parity():
    b, e, din, dout = 5, 3, 6, 6
    x = rng.standard_normal((b, din)).astype(np.float32)
    nbr = rng.standard_normal((b * e, din)).astype(np.float32)
    w = rng.standard_normal((din, dout)).astype(np.float32)
    eps = 0.3

    def build():
        conv = REF["ego_gin_conv"].EgoGINConv("t", in_dim=din, out_dim=dout,
                                              eps=eps)
        out = conv.forward(tf1.constant(x), tf1.constant(nbr), e)
        return out, _assign_all({"ego_gin_layer_t/output/weights": w})

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.ego import EgoGINConv
    ours = EgoGINConv(in_dim=din, out_dim=dout, eps=eps)
    params = {"params": {"output": {"kernel": jnp.asarray(w)}}}
    got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(nbr), e))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ego_gat_conv_parity():
    b, e, din, dout, heads = 4, 3, 6, 5, 2
    x = rng.standard_normal((b, din)).astype(np.float32)
    nbr = rng.standard_normal((b * e, din)).astype(np.float32)
    wx = [rng.standard_normal((din, dout)).astype(np.float32)
          for _ in range(heads)]
    wa = [rng.standard_normal((2 * dout, 1)).astype(np.float32)
          for _ in range(heads)]

    def build():
        conv = REF["ego_gat_conv"].EgoGATConv("t", in_dim=din, out_dim=dout,
                                              num_head=heads)
        out = conv.forward(tf1.constant(x), tf1.constant(nbr), e)
        assigns = {}
        for i in range(heads):
            assigns["ego_gat_layer_t/x_%d/weights" % i] = wx[i]
            assigns["ego_gat_layer_t/attn_%d/weights" % i] = wa[i]
        return out, _assign_all(assigns)

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.ego import EgoGATConv
    ours = EgoGATConv(in_dim=din, out_dim=dout, num_head=heads)
    p = {"params": {}}
    for i in range(heads):
        p["params"]["x_%d" % i] = {"kernel": jnp.asarray(wx[i])}
        p["params"]["attn_%d" % i] = {"kernel": jnp.asarray(wa[i])}
    got = np.asarray(ours.apply(p, jnp.asarray(x), jnp.asarray(nbr), e))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["plain", "bases", "blocks"])
def test_ego_rgcn_conv_parity(mode):
    b, e, din, dout, R = 4, 3, 6, 6, 2
    x = rng.standard_normal((b, din)).astype(np.float32)
    nbrs = [rng.standard_normal((b * e, din)).astype(np.float32)
            for _ in range(R)]
    root = rng.standard_normal((din, dout)).astype(np.float32)
    kw = {}
    assigns = {"ego_rgcn_layer_t/root_weight/weights": root}
    if mode == "bases":
        kw["num_bases"] = 2
        w = rng.standard_normal((2, din, dout)).astype(np.float32)
        coef = rng.standard_normal((R, 2)).astype(np.float32)
        assigns["ego_rgcn_layer_t/weight"] = w
        assigns["ego_rgcn_layer_t/coefficient"] = coef
    elif mode == "blocks":
        kw["num_blocks"] = 2
        w = rng.standard_normal((R, 2, din // 2, dout // 2)).astype(np.float32)
        assigns["ego_rgcn_layer_t/weight"] = w
    else:
        w = rng.standard_normal((R, din, dout)).astype(np.float32)
        assigns["ego_rgcn_layer_t/weight"] = w

    def build():
        conv = REF["ego_rgcn_conv"].EgoRGCNConv(
            "t", in_dim=din, out_dim=dout, num_relations=R,
            agg_type="mean", **kw)
        out = conv.forward(tf1.constant(x),
                           [tf1.constant(n) for n in nbrs], e)
        return out, _assign_all(assigns)

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.ego import EgoRGCNConv
    ours = EgoRGCNConv(in_dim=din, out_dim=dout, num_relations=R,
                       agg_type="mean",
                       num_bases=kw.get("num_bases"),
                       num_blocks=kw.get("num_blocks"))
    p = {"params": {"root_weight": {"kernel": jnp.asarray(root)},
                    "weight": jnp.asarray(w)}}
    if mode == "bases":
        p["params"]["coefficient"] = jnp.asarray(coef)
    got = np.asarray(ours.apply(p, jnp.asarray(x),
                                [jnp.asarray(n) for n in nbrs], e))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sage_conv_subgraph_parity():
    n, m, din, dout = 7, 10, 6, 4
    x = rng.standard_normal((n, din)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]).astype(np.int32)
    ws = rng.standard_normal((din, dout)).astype(np.float32)
    wn = rng.standard_normal((din, dout)).astype(np.float32)

    def build():
        conv = REF["sage_conv"].SAGEConv(din, dout, agg_type="mean", name="s")
        out = conv.forward(tf1.constant(ei), tf1.constant(x))
        return out, _assign_all({"s/layer/self_weights": ws,
                                 "s/layer/neigh_weights": wn})

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.sub import SAGEConv
    ours = SAGEConv(in_dim=din, out_dim=dout, agg_type="mean")
    p = {"params": {"self_weights": {"kernel": jnp.asarray(ws)},
                    "neigh_weights": {"kernel": jnp.asarray(wn)}}}
    got = np.asarray(ours.apply(p, jnp.asarray(ei), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gcn_conv_subgraph_parity():
    n, m, din, dout = 6, 9, 5, 4
    x = rng.standard_normal((n, din)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]).astype(np.int32)
    w = rng.standard_normal((din, dout)).astype(np.float32)

    def build():
        conv = REF["gcn_conv"].GCNConv(din, dout, name="g")
        out = conv.forward(tf1.constant(ei), tf1.constant(x))
        return out, _assign_all({"g/layer/weights": w})

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.sub import GCNConv
    ours = GCNConv(in_dim=din, out_dim=dout)
    p = {"params": {"weights": {"kernel": jnp.asarray(w)}}}
    got = np.asarray(ours.apply(p, jnp.asarray(ei), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_losses_parity():
    b, d = 8, 16
    src = rng.standard_normal((b, d)).astype(np.float32)
    pos = rng.standard_normal((b, d)).astype(np.float32)
    neg = rng.standard_normal((b * 2, d)).astype(np.float32)

    def build():
        out = REF["loss"].unsupervised_softmax_cross_entropy_loss(
            tf1.constant(src), tf1.constant(pos), tf1.constant(neg))
        return out, []

    ref = _run_tf(build)
    from graph_learn_tpu.nn.loss import unsupervised_softmax_cross_entropy_loss
    got = float(unsupervised_softmax_cross_entropy_loss(
        jnp.asarray(src), jnp.asarray(pos), jnp.asarray(neg)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    def build2():
        out = REF["loss"].sigmoid_cross_entropy_loss(
            tf1.constant(src[:, 0]), tf1.constant(pos[:, 0]))
        return out, []

    ref2 = _run_tf(build2)
    from graph_learn_tpu.nn.loss import sigmoid_cross_entropy_loss
    got2 = float(sigmoid_cross_entropy_loss(jnp.asarray(src[:, 0]),
                                            jnp.asarray(pos[:, 0])))
    np.testing.assert_allclose(got2, ref2, rtol=1e-5)


@pytest.mark.parametrize("concat", [False, True])
def test_gat_conv_subgraph_parity(concat):
    n, m, din, dout, H = 6, 9, 6, 5, 2
    x = rng.standard_normal((n, din)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)]).astype(np.int32)
    w = rng.standard_normal((din, H * dout)).astype(np.float32)
    a_src = rng.standard_normal((1, H, dout)).astype(np.float32)
    a_dst = rng.standard_normal((1, H, dout)).astype(np.float32)

    def build():
        conv = REF["gat_conv"].GATConv(dout, num_heads=H, concat=concat,
                                       name="g")
        out = conv.forward(tf1.constant(ei), tf1.constant(x))
        return out, _assign_all({
            "g/layer/attention_weights_src": a_src,
            "g/layer/attention_weights_dst": a_dst,
            "gw/kernel": w})

    ref = _run_tf(build)

    from graph_learn_tpu.nn.layers.sub import GATConv
    ours = GATConv(in_dim=din, out_dim=dout, num_heads=H, concat=concat)
    p = {"params": {"w": {"kernel": jnp.asarray(w)},
                    "attn_src": jnp.asarray(a_src),
                    "attn_dst": jnp.asarray(a_dst)}}
    got = np.asarray(ours.apply(p, jnp.asarray(ei), jnp.asarray(x)))
    # reference concat branch is a no-op split+concat that leaves the
    # output 3D [n, H, D] (gat_conv.py:113-115); ours returns the intended
    # [n, H*D] — values identical under reshape
    np.testing.assert_allclose(got, ref.reshape(got.shape),
                               rtol=1e-4, atol=1e-4)
