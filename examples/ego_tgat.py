"""EgoTGAT temporal link prediction on a bipartite event stream.

Parity with graphlearn/examples/tf/ego_tgat/train_eval.py: traverse
timestamped events with ``g.E('train')``, build src/dst/neg towers whose
hops are recency-topk TEMPORAL neighbors (only edges strictly before the
event), encode time spans with the Bochner TimeEncoder, attend with GAT
convs over [node ++ edge ++ time] neighbor features, score links with
MergeLayer affinity; eval = mean(pos>0.5, neg<0.5) on held-out events.

TPU notes: the whole tower trio is ONE jitted program; temporal prefix
sampling is exact (ts-ordered CSR + searchsorted upper bounds) instead of
the reference's retry-and-filter loop.
"""

import argparse
import os

from common import ensure_platform  # noqa: F401  (sets platform first)

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

import graph_learn_tpu as gl
from data.synthetic import temporal_u2i
from graph_learn_tpu.nn.data import TemporalGraph
from graph_learn_tpu.nn.feature_column import FeatureEncoder
from graph_learn_tpu.nn.loss import sigmoid_cross_entropy_loss
from graph_learn_tpu.nn.models.tgat import EgoTGAT, LinkScorePredict
from graph_learn_tpu.nn.trainer import LocalTrainer


def load(data_dir, feat_dim, edge_feat_dim):
    if not os.path.exists(os.path.join(data_dir, "user_table")):
        temporal_u2i(data_dir, feat_dim=feat_dim,
                     edge_feat_dim=edge_feat_dim)
    udec = gl.Decoder(attr_types=["float"] * feat_dim)
    idec = gl.Decoder(attr_types=["float"] * feat_dim)
    edec = gl.Decoder(attr_types=["float"] * edge_feat_dim,
                      timestamped=True)
    g = gl.Graph() \
        .node(os.path.join(data_dir, "user_table"), "u", udec) \
        .node(os.path.join(data_dir, "item_table"), "i", idec) \
        .edge(os.path.join(data_dir, "interaction_table"),
              ("u", "i", "interaction"), edec, directed=False) \
        .edge(os.path.join(data_dir, "train_table"),
              ("u", "i", "train"), edec) \
        .edge(os.path.join(data_dir, "test_table"),
              ("u", "i", "test"), edec)
    return g.init(), udec, idec, edec


def build_query(g, batch_size, nbrs, etype="train"):
    """Event query with temporal topk hops per tower (train_eval.py:58-78).

    src (u-type) hops: interaction -> interaction_reverse;
    dst/neg (i-type) hops: interaction_reverse -> interaction.
    """
    events = g.E(etype).batch(batch_size).alias("event")
    src = events.outV().alias("src")
    dst = events.inV().alias("dst")
    neg = src.outNeg("interaction").sample(1).by("random").alias("neg")

    def hops(v, name, etypes):
        cur = v
        for i, (k, et) in enumerate(zip(nbrs, etypes)):
            e = cur.outE(et).sample(k).by("topk") \
                .alias("%s_nbr_%d" % (name, i + 1))
            cur = e.inV().alias("%s_nbr_node_%d" % (name, i + 1))

    hops(src, "src", ["interaction", "interaction_reverse"])
    hops(dst, "dst", ["interaction_reverse", "interaction"])
    hops(neg, "neg", ["interaction_reverse", "interaction"])
    return events.values()


def tower(result, name, nhops):
    return TemporalGraph.from_query_result(
        result, name,
        ["%s_nbr_%d" % (name, i + 1) for i in range(nhops)],
        ["%s_nbr_node_%d" % (name, i + 1) for i in range(nhops)],
        "event")


class TGATLink(nn.Module):
    """Three towers + affinity scorer in one module (shared item tower)."""

    udec: gl.Decoder
    idec: gl.Decoder
    hidden: int
    out_dim: int
    time_dim: int
    nhops: int
    num_head: int = 2

    def setup(self):
        # u-rooted tower alternates u,i,u,...; i-rooted i,u,i,...
        uenc = FeatureEncoder(self.udec, name="u_enc")
        ienc = FeatureEncoder(self.idec, name="i_enc")
        alt_u = [uenc if i % 2 == 0 else ienc
                 for i in range(self.nhops + 1)]
        alt_i = [ienc if i % 2 == 0 else uenc
                 for i in range(self.nhops + 1)]
        self.u_tower = EgoTGAT(
            hidden_dim=self.hidden, out_dim=self.out_dim,
            time_dim=self.time_dim, num_hops=self.nhops,
            encoders=alt_u, num_head=self.num_head, name="u_tower")
        self.i_tower = EgoTGAT(
            hidden_dim=self.hidden, out_dim=self.out_dim,
            time_dim=self.time_dim, num_hops=self.nhops,
            encoders=alt_i, num_head=self.num_head, name="i_tower")
        self.scorer = LinkScorePredict(self.out_dim, name="scorer")

    def __call__(self, src_tg, dst_tg, neg_tg, training=False):
        src_emb = self.u_tower(src_tg, training=training)
        dst_emb = self.i_tower(dst_tg, training=training)
        neg_emb = self.i_tower(neg_tg, training=training)
        return self.scorer(src_emb, dst_emb, neg_emb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/glt_tgat")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--feat-dim", type=int, default=8)
    ap.add_argument("--edge-feat-dim", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--out-dim", type=int, default=16)
    ap.add_argument("--time-dim", type=int, default=8)
    ap.add_argument("--nbrs", type=int, nargs="+", default=[8, 4])
    args = ap.parse_args()

    g, udec, idec, edec = load(args.data_dir, args.feat_dim,
                               args.edge_feat_dim)
    nhops = len(args.nbrs)
    q = build_query(g, args.batch_size, args.nbrs, "train")
    model = TGATLink(udec=udec, idec=idec, hidden=args.hidden,
                     out_dim=args.out_dim, time_dim=args.time_dim,
                     nhops=nhops)

    ds = gl.Dataset(q, window=1)
    b0 = ds.next()
    towers0 = [tower(b0, n, nhops) for n in ("src", "dst", "neg")]
    params = model.init(jax.random.key(0), *towers0, training=False)

    def loss_fn(model, p, batch, rng, training):
        tgs = [tower(batch, n, nhops) for n in ("src", "dst", "neg")]
        pos, neg = model.apply(p, *tgs, training=training,
                               rngs={"dropout": rng})
        return sigmoid_cross_entropy_loss(pos, neg)

    def acc_fn(model, p, batch):
        tgs = [tower(batch, n, nhops) for n in ("src", "dst", "neg")]
        pos, neg = model.apply(p, *tgs, training=False)
        return ((jax.nn.sigmoid(pos) > 0.5).astype(jnp.float32)
                + (jax.nn.sigmoid(neg) < 0.5).astype(jnp.float32)) / 2.0

    trainer = LocalTrainer()
    params, hist = trainer.train(q, model, params, loss_fn,
                                 optax.adam(1e-3), epochs=args.epochs)
    q_test = build_query(g, args.batch_size, args.nbrs, "test")
    acc = trainer.evaluate(q_test, model, params, acc_fn)
    print("test link-pred acc: %.4f" % acc)
    return acc


if __name__ == "__main__":
    main()
