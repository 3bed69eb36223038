"""Unsupervised SubGraph-mode GraphSAGE (edge-induced enclosing stars).

Parity with graphlearn/examples/tf/sage/train.py: edge seeds on an
undirected train edge type, full-neighbor 1-hop per endpoint, per-edge
star subgraphs via the EdgeInducer pattern (edge_inducer.py:29-107 ->
BatchGraph.from_edge_star), GraphSAGE convs over the batched edge_index,
dot-product affinity with sigmoid CE against outNeg negatives.

Eval: link AUC-style accuracy on held-out edges (pos score > neg score).
"""

import argparse
import os

from common import ensure_platform  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from data.synthetic import cora_like
from graph_learn_tpu.nn.feature_column import FeatureEncoder
from graph_learn_tpu.nn.loss import sigmoid_cross_entropy_loss
from graph_learn_tpu.nn.models.sub_models import GraphSAGE
from graph_learn_tpu.nn.subgraph_data import BatchGraph
from graph_learn_tpu.nn.trainer import LocalTrainer
from flax import linen as nn


def load(data_dir, feat_dim):
    if not os.path.exists(os.path.join(data_dir, "node_table")):
        cora_like(data_dir, n=800, feat_dim=feat_dim)
    dec = gl.Decoder(labeled=True, attr_types=["float"] * feat_dim)
    g = (gl.Graph()
         .node(os.path.join(data_dir, "node_table"), "i", dec)
         .edge(os.path.join(data_dir, "edge_table"), ("i", "i", "train"),
               gl.Decoder(weighted=True), directed=False)).init()
    return g, dec


def build_query(g, batch_size, nbrs_num):
    """train.py:43-52 — full 1-hop per endpoint + 1 negative."""
    seed = g.E("train").batch(batch_size).shuffle(traverse=True).alias("seed")
    src = seed.outV().alias("pos_src")
    src.outV("train").sample(nbrs_num).by("full").alias("src_hop1")
    dst = seed.inV().alias("pos_dst")
    dst.outV("train").sample(nbrs_num).by("full").alias("dst_hop1")
    neg = src.outNeg("train").sample(1).by("random").alias("neg_dst")
    neg.outV("train").sample(nbrs_num).by("full").alias("neg_hop1")
    return seed.values()


def induce(batch):
    """EdgeInducer.induce_func equivalent: pos + neg BatchGraphs."""
    pos = BatchGraph.from_edge_star(
        batch["pos_src"], batch["pos_dst"],
        batch["src_hop1"], batch["dst_hop1"])
    neg = BatchGraph.from_edge_star(
        batch["pos_src"], batch["neg_dst"],
        batch["src_hop1"], batch["neg_hop1"])
    return pos, neg


class SageLink(nn.Module):
    dec: gl.Decoder
    feat_dim: int
    hidden: int
    out_dim: int
    depth: int = 2
    agg_type: str = "mean"

    def setup(self):
        self.enc = FeatureEncoder(self.dec, name="enc")
        dims = [self.feat_dim] + [self.hidden] * (self.depth - 1) \
            + [self.out_dim]
        self.sage = GraphSAGE(dims, agg_type=self.agg_type)

    def score(self, bg, training):
        x = self.enc(bg.nodes)
        x = jnp.where(bg.node_mask[:, None], x, 0.0)
        h = self.sage(bg.edge_index, x, edge_mask=bg.edge_mask,
                      training=training)
        src_emb = bg.anchor(h, 0)
        dst_emb = bg.anchor(h, 1)
        return jnp.sum(src_emb * dst_emb, axis=-1)

    def __call__(self, pos_bg, neg_bg, training=False):
        return self.score(pos_bg, training), self.score(neg_bg, training)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/glt_sage_unsup")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps-per-epoch", type=int, default=30)
    ap.add_argument("--feat-dim", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--out-dim", type=int, default=32)
    ap.add_argument("--nbrs-num", type=int, default=16)
    args = ap.parse_args()

    g, dec = load(args.data_dir, args.feat_dim)
    q = build_query(g, args.batch_size, args.nbrs_num)
    model = SageLink(dec=dec, feat_dim=args.feat_dim, hidden=args.hidden,
                     out_dim=args.out_dim)

    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    pos0, neg0 = induce(b0)
    params = model.init(jax.random.key(0), pos0, neg0, training=False)

    def loss_fn(model, p, batch, rng, training):
        pos_bg, neg_bg = induce(batch)
        pos, neg = model.apply(p, pos_bg, neg_bg, training=training,
                               rngs={"dropout": rng})
        return sigmoid_cross_entropy_loss(pos, neg)

    def acc_fn(model, p, batch):
        pos_bg, neg_bg = induce(batch)
        pos, neg = model.apply(p, pos_bg, neg_bg, training=False)
        return (pos > neg).astype(jnp.float32)

    trainer = LocalTrainer()
    params, _ = trainer.train(q, model, params, loss_fn,
                              optax.adam(5e-4), epochs=args.epochs,
                              steps_per_epoch=args.steps_per_epoch)
    acc = trainer.evaluate(q, model, params, acc_fn)
    print("link accuracy (pos>neg): %.4f" % acc)
    return acc


if __name__ == "__main__":
    main()
