"""EgoRGCN supervised: 2 relations, basis/block decomposition.

Parity with graphlearn/examples/tf/ego_rgcn/train_supervised.py:51-116
(two edge tables over the same nodes, num_bases/num_blocks, fanout [10, 5],
hop tree expanded per relation each level).
"""

import argparse

from common import ensure_platform, load_cora_like

import jax
import jax.numpy as jnp
import optax

import graph_learn_tpu as gl
from graph_learn_tpu.nn.data import EgoGraph
from graph_learn_tpu.nn.loss import supervised_softmax_loss
from graph_learn_tpu.nn.models.ego_gnn import EgoRGCN
from graph_learn_tpu.nn.trainer import LocalTrainer

RELS = ["relation", "relation2"]


def rgcn_query(g, mask, batch_size, nbrs):
    """Hop tree: level l has R^l per-relation groups (ego_rgcn loader)."""
    src = g.V("item", mask=mask).batch(batch_size).alias("src")
    aliases = []
    frontier = [("", src)]
    for level, k in enumerate(nbrs):
        nxt = []
        for prefix, node in frontier:
            for r, rel in enumerate(RELS):
                alias = "%sr%d_h%d" % (prefix, r, level + 1)
                hop = node.outV(rel).sample(k).by("random").alias(alias)
                aliases.append(alias)
                nxt.append(("%sr%d_" % (prefix, r), hop))
        frontier = nxt
    return src.values(), aliases


def make_ego(batch, aliases, nbrs):
    hops = [batch[a] for a in aliases]
    return EgoGraph(src=batch["src"], hops=hops, nbr_nums=tuple(nbrs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_cora_like")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--features_num", type=int, default=64)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--nbrs", type=int, nargs="+", default=[10, 5])
    ap.add_argument("--num_bases", type=int, default=1)
    ap.add_argument("--num_blocks", type=int, default=0)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    g, dec = load_cora_like(args.data_dir, args.features_num,
                            two_relations=True)
    dims = [args.features_num, args.hidden, args.classes]
    model = EgoRGCN(dims=dims, decoder=dec, num_relations=len(RELS),
                    num_bases=args.num_bases or None,
                    num_blocks=args.num_blocks or None)
    train_q, aliases = rgcn_query(g, gl.Mask.TRAIN, args.batch_size,
                                  args.nbrs)
    test_q, _ = rgcn_query(g, gl.Mask.TEST, args.batch_size, args.nbrs)

    ds = gl.Dataset(train_q, window=1)
    b0 = ds.next()
    params = model.init(jax.random.key(0), make_ego(b0, aliases, args.nbrs),
                        training=False)

    def loss_fn(model, p, batch, rng, training):
        ego = make_ego(batch, aliases, args.nbrs)
        logits = model.apply(p, ego, training=training,
                             rngs={"dropout": rng})
        return supervised_softmax_loss(logits, batch["src"].labels)

    def acc_fn(model, p, batch):
        ego = make_ego(batch, aliases, args.nbrs)
        logits = model.apply(p, ego, training=False)
        return (jnp.argmax(logits, 1) == batch["src"].labels).astype(jnp.float32)

    tr = LocalTrainer()
    params, _ = tr.train(train_q, model, params, loss_fn,
                         optax.adam(args.lr), epochs=args.epochs)
    acc = tr.evaluate(test_q, model, params, acc_fn)
    print("test accuracy: %.4f" % acc)
    return acc


if __name__ == "__main__":
    main()
