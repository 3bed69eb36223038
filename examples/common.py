"""Shared example harness: graph loading + supervised loop pieces."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from graph_learn_tpu.utils.platform import ensure_platform

ensure_platform()

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.loss import supervised_softmax_loss
from graph_learn_tpu.nn.trainer import LocalTrainer
from data.synthetic import cora_like, u2i


def load_cora_like(data_dir, feat_dim=64, nodes=1000, classes=7,
                   two_relations=False):
    if not os.path.exists(os.path.join(data_dir, "node_table")):
        cora_like(data_dir, n=nodes, classes=classes, feat_dim=feat_dim)
    node_decoder = gl.Decoder(labeled=True, attr_types=["float"] * feat_dim)
    g = (gl.Graph()
         .node(os.path.join(data_dir, "node_table"), "item", node_decoder)
         .edge(os.path.join(data_dir, "edge_table"),
               ("item", "item", "relation"),
               gl.Decoder(weighted=True), directed=False)
         .node(os.path.join(data_dir, "train_table"), "item",
               gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
         .node(os.path.join(data_dir, "val_table"), "item",
               gl.Decoder(weighted=True), mask=gl.Mask.VAL)
         .node(os.path.join(data_dir, "test_table"), "item",
               gl.Decoder(weighted=True), mask=gl.Mask.TEST))
    if two_relations:
        # second relation reuses the same table (reference ego_rgcn runs
        # two Cora edge tables, train_supervised.py:51-116)
        g.edge(os.path.join(data_dir, "edge_table"),
               ("item", "item", "relation2"),
               gl.Decoder(weighted=True), directed=False)
    return g.init(), node_decoder


def supervised_query(g, mask, batch_size, nbrs, edge_type="relation",
                     sampler="random"):
    q = g.V("item", mask=mask).batch(batch_size).alias("src")
    for i, k in enumerate(nbrs):
        q = q.outV(edge_type).sample(k).by(sampler).alias("hop%d" % (i + 1))
    return q.values()


def supervised_loss_fn(hop_aliases):
    def loss_fn(model, params, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", hop_aliases)
        logits = model.apply(params, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)
    return loss_fn


def accuracy_fn(hop_aliases):
    def metric_fn(model, params, batch):
        ego = EgoGraph.from_query_result(batch, "src", hop_aliases)
        logits = model.apply(params, ego, training=False)
        return (jnp.argmax(logits, 1) == batch["src"].labels).astype(jnp.float32)
    return metric_fn


def init_from_first_batch(model, q, src_alias, hop_aliases):
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    ego0 = EgoGraph.from_query_result(b0, src_alias, hop_aliases)
    return model.init(jax.random.key(0), ego0, training=False)
