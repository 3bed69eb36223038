"""Bipartite GraphSAGE u2i link prediction with negatives + recall@k eval.

Parity with graphlearn/examples/tf/ego_bipartite_sage/train.py:80-117:
edge seeds on u-i, src/dst towers via alternating u-i / i-i meta-paths,
outNeg negatives, in-batch softmax loss; Recall@20/Hitrate@20 metrics
(README.md:36).
"""

import argparse

from common import ensure_platform

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from data.synthetic import u2i
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.loss import unsupervised_softmax_cross_entropy_loss
from graph_learn_tpu.nn.models.ego_gnn import EgoGNN
from graph_learn_tpu.nn.feature_column import FeatureEncoder
from graph_learn_tpu.nn.layers.ego import EgoLayer, EgoSAGEConv
from graph_learn_tpu.nn.trainer import LocalTrainer

import os


def load(data_dir, feat_dim):
    if not os.path.exists(os.path.join(data_dir, "user_table")):
        u2i(data_dir, feat_dim=feat_dim)
    udec = gl.Decoder(attr_types=["float"] * feat_dim)
    idec = gl.Decoder(attr_types=["float"] * feat_dim)
    g = (gl.Graph()
         .node(os.path.join(data_dir, "user_table"), "u", udec)
         .node(os.path.join(data_dir, "item_table"), "i", idec)
         .edge(os.path.join(data_dir, "u2i_table"), ("u", "i", "u-i"),
               gl.Decoder(weighted=True))
         .edge(os.path.join(data_dir, "i2i_table"), ("i", "i", "i-i"),
               gl.Decoder(weighted=True))).init()
    return g, udec, idec


def build_query(g, batch_size, nbrs):
    """u tower: u -> u-i items; i tower: i -> i-i items (train.py:88-112)."""
    seed = g.E("u-i").batch(batch_size).shuffle(traverse=True).alias("seed")
    src = seed.outV().alias("src")
    dst = seed.inV().alias("dst")
    neg = src.outNeg("u-i").sample(2).by("random").alias("neg")
    src.outV("u-i").sample(nbrs[0]).by("random").alias("src_h1")
    dst.outV("i-i").sample(nbrs[0]).by("random").alias("dst_h1")
    neg.outV("i-i").sample(nbrs[0]).by("random").alias("neg_h1")
    return seed.values()


def towers(udec, idec, feat_dim, hidden, out_dim):
    u_tower = EgoGNN(
        layers=[EgoLayer(convs=[EgoSAGEConv(in_dim=(feat_dim, feat_dim),
                                            out_dim=out_dim,
                                            agg_type="mean")])],
        hop_encoders=[FeatureEncoder(udec), FeatureEncoder(idec)])
    i_tower = EgoGNN(
        layers=[EgoLayer(convs=[EgoSAGEConv(in_dim=(feat_dim, feat_dim),
                                            out_dim=out_dim,
                                            agg_type="mean")])],
        hop_encoders=[FeatureEncoder(idec), FeatureEncoder(idec)])
    return u_tower, i_tower


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_u2i_ex")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--feat_dim", type=int, default=16)
    ap.add_argument("--out_dim", type=int, default=32)
    ap.add_argument("--nbrs", type=int, nargs="+", default=[5])
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--steps_per_epoch", type=int, default=30)
    args = ap.parse_args(argv)

    g, udec, idec = load(args.data_dir, args.feat_dim)
    u_tower, i_tower = towers(udec, idec, args.feat_dim, 32, args.out_dim)

    q = build_query(g, args.batch_size, args.nbrs)
    ds = gl.Dataset(q, window=1)
    b0 = ds.next()

    def egos(batch):
        src = EgoGraph.from_query_result(batch, "src", ["src_h1"])
        dst = EgoGraph.from_query_result(batch, "dst", ["dst_h1"])
        neg = batch["neg"].flat()
        # flatten the [b, neg, k] hop to match the flattened neg seeds
        neg_h1 = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]) if hasattr(x, "reshape")
            else x, batch["neg_h1"])
        negego = EgoGraph(src=neg, hops=[neg_h1],
                          nbr_nums=(batch["neg_h1"].ids.shape[-1],))
        return src, dst, negego

    s0, d0, n0 = egos(b0)
    params = {
        "u": u_tower.init(jax.random.key(0), s0),
        "i": i_tower.init(jax.random.key(1), d0),
    }

    def loss_fn(model, p, batch, rng, training):
        src, dst, neg = egos(batch)
        u_emb = u_tower.apply(p["u"], src, training=training,
                              rngs={"dropout": rng})
        i_emb = i_tower.apply(p["i"], dst, training=training,
                              rngs={"dropout": rng})
        n_emb = i_tower.apply(p["i"], neg, training=training,
                              rngs={"dropout": rng})
        return unsupervised_softmax_cross_entropy_loss(u_emb, i_emb, n_emb)

    tr = LocalTrainer()
    params, hist = tr.train(q, None, params, loss_fn, optax.adam(args.lr),
                            epochs=args.epochs,
                            steps_per_epoch=args.steps_per_epoch)

    # recall@20: rank all items for held-out users
    recall = eval_recall(g, params, u_tower, i_tower, udec, idec,
                         args.nbrs, k=20)
    print("recall@20: %.4f" % recall)
    return recall


def eval_recall(g, params, u_tower, i_tower, udec, idec, nbrs, k=20):
    # embed all users and items through their towers
    uq = (g.V("u").batch(64).alias("src")
          .outV("u-i").sample(nbrs[0]).by("random").alias("src_h1").values())
    iq = (g.V("i").batch(64).alias("src")
          .outV("i-i").sample(nbrs[0]).by("random").alias("src_h1").values())

    def embed_all(q, tower, p):
        ds = gl.Dataset(q, window=1)
        embs, ids = [], []
        try:
            while True:
                batch, count = ds.next_with_count()
                ego = EgoGraph.from_query_result(batch, "src", ["src_h1"])
                e = tower.apply(p, ego, training=False)
                embs.append(np.asarray(e)[:count])
                ids.append(np.asarray(batch["src"].ids)[:count])
        except gl.OutOfRangeError:
            pass
        return np.concatenate(embs), np.concatenate(ids)

    u_emb, u_ids = embed_all(uq, u_tower, params["u"])
    i_emb, i_ids = embed_all(iq, i_tower, params["i"])
    scores = u_emb @ i_emb.T
    top = np.argsort(-scores, axis=1)[:, :k]
    et = g.store.edge_table("u-i")
    truth = {}
    for s, d in zip(et.src, et.dst):
        truth.setdefault(int(s), set()).add(int(d))
    hits, total = 0, 0
    for row, u in enumerate(u_ids):
        t = truth.get(int(u), set())
        if not t:
            continue
        got = {int(i_ids[c]) for c in top[row]}
        hits += len(got & t)
        total += min(len(t), k)
    return hits / max(total, 1)


if __name__ == "__main__":
    main()
