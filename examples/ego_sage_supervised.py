"""EgoSAGE supervised node classification — the reference's flagship flow.

Parity with graphlearn/examples/tf/ego_sage/train_supervised.py:48-135
(fanout [25,10] 2 hops, agg 'gcn', hidden 128, Adam, masked train/test
splits), on a synthetic homophilous graph (no network egress for real Cora;
generator: examples/data/synthetic.py).

Run:  python examples/ego_sage_supervised.py [--epochs 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from graph_learn_tpu.utils.platform import ensure_platform

ensure_platform()  # GLT_PLATFORM=cpu forces CPU despite sitecustomize

import jax
import jax.numpy as jnp
import optax

import graph_learn_tpu as gl
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.loss import supervised_softmax_loss
from graph_learn_tpu.nn.models.ego_gnn import EgoGraphSAGE
from graph_learn_tpu.nn.trainer import LocalTrainer
from data.synthetic import cora_like


def load_graph(data_dir, feat_dim):
    node_decoder = gl.Decoder(labeled=True, attr_types=["float"] * feat_dim)
    g = (gl.Graph()
         .node(os.path.join(data_dir, "node_table"), node_type="item",
               decoder=node_decoder)
         .edge(os.path.join(data_dir, "edge_table"),
               edge_type=("item", "item", "relation"),
               decoder=gl.Decoder(weighted=True), directed=False)
         .node(os.path.join(data_dir, "train_table"), node_type="item",
               decoder=gl.Decoder(weighted=True), mask=gl.Mask.TRAIN)
         .node(os.path.join(data_dir, "val_table"), node_type="item",
               decoder=gl.Decoder(weighted=True), mask=gl.Mask.VAL)
         .node(os.path.join(data_dir, "test_table"), node_type="item",
               decoder=gl.Decoder(weighted=True), mask=gl.Mask.TEST))
    return g.init(), node_decoder


def build_query(g, mask, batch_size, nbrs, sampler="random"):
    q = g.V("item", mask=mask).batch(batch_size).alias("src")
    for i, k in enumerate(nbrs):
        q = q.outV("relation").sample(k).by(sampler).alias("hop%d" % (i + 1))
    return q.values()


def make_loss(hop_aliases):
    def loss_fn(model, params, batch, rng, training):
        ego = EgoGraph.from_query_result(batch, "src", hop_aliases)
        logits = model.apply(params, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)
    return loss_fn


def make_acc(hop_aliases):
    def metric_fn(model, params, batch):
        ego = EgoGraph.from_query_result(batch, "src", hop_aliases)
        logits = model.apply(params, ego, training=False)
        pred = jnp.argmax(logits, axis=1)
        return (pred == batch["src"].labels).astype(jnp.float32)
    return metric_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_cora_like")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=140)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--features_num", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=1000)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--nbrs", type=int, nargs="+", default=[25, 10])
    ap.add_argument("--agg", default="gcn")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--dropout", type=float, default=0.5)
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.data_dir, "node_table")):
        info = cora_like(args.data_dir, n=args.nodes, classes=args.classes,
                         feat_dim=args.features_num)
        print("generated:", info)

    g, node_decoder = load_graph(args.data_dir, args.features_num)
    print("stats:", g.get_stats())

    dims = [args.features_num, args.hidden, args.classes]
    model = EgoGraphSAGE(dims, node_decoder, agg_type=args.agg,
                         dropout=args.dropout)
    hop_aliases = ["hop%d" % (i + 1) for i in range(len(args.nbrs))]

    train_q = build_query(g, gl.Mask.TRAIN, args.batch_size, args.nbrs)
    test_q = build_query(g, gl.Mask.TEST, args.batch_size, args.nbrs)

    # init params from one sampled batch
    ds = gl.Dataset(train_q, window=1)
    batch0 = ds.next()
    ego0 = EgoGraph.from_query_result(batch0, "src", hop_aliases)
    params = model.init(jax.random.key(0), ego0, training=False)

    trainer = LocalTrainer()
    params, hist = trainer.train(
        train_q, model, params, make_loss(hop_aliases),
        optax.adam(args.lr), epochs=args.epochs)
    acc = trainer.evaluate(test_q, model, params, make_acc(hop_aliases))
    print("test accuracy: %.4f" % acc)
    return acc


if __name__ == "__main__":
    main()
