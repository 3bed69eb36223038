"""EgoGAT supervised node classification.

Parity with graphlearn/examples/tf/ego_gat/train_supervised.py:100-158
(hidden 16, heads [8, 1], attn dropout 0.6, fanout [5, 2], 2 hops).
"""

import argparse

from common import (accuracy_fn, ensure_platform, init_from_first_batch,
                    load_cora_like, supervised_loss_fn, supervised_query)

import optax

import graph_learn_tpu as gl
from graph_learn_tpu.nn.models.ego_gnn import EgoGAT
from graph_learn_tpu.nn.trainer import LocalTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_cora_like")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=140)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--features_num", type=int, default=64)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--nbrs", type=int, nargs="+", default=[5, 2])
    ap.add_argument("--heads", type=int, nargs="+", default=[8, 1])
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--attn_drop", type=float, default=0.6)
    args = ap.parse_args()

    g, dec = load_cora_like(args.data_dir, args.features_num)
    dims = [args.features_num, args.hidden, args.classes]
    model = EgoGAT(dims, dec, num_heads=args.heads,
                   attn_dropout=args.attn_drop)
    hops = ["hop%d" % (i + 1) for i in range(len(args.nbrs))]
    train_q = supervised_query(g, gl.Mask.TRAIN, args.batch_size, args.nbrs)
    test_q = supervised_query(g, gl.Mask.TEST, args.batch_size, args.nbrs)
    params = init_from_first_batch(model, train_q, "src", hops)
    tr = LocalTrainer()
    params, _ = tr.train(train_q, model, params, supervised_loss_fn(hops),
                         optax.adam(args.lr), epochs=args.epochs)
    acc = tr.evaluate(test_q, model, params, accuracy_fn(hops))
    print("test accuracy: %.4f" % acc)
    return acc


if __name__ == "__main__":
    main()
