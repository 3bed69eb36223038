"""node2vec: biased random walks + skip-gram with negative sampling.

Parity with graphlearn/examples/tf/node2vec
(dist_train.py:76-86 window pairing, node2vec.py:39-55 skip-gram loss):
GSL random_walk -> window pairs -> embedding dot-product loss with
uniform negatives.
"""

import argparse
import os

from common import ensure_platform

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from data.synthetic import cora_like
from graph_learn_tpu.gsl.compile import _execute
from graph_learn_tpu.ops.walk import skipgram_pairs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_cora_like")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--walk_len", type=int, default=10)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--emb_dim", type=int, default=64)
    ap.add_argument("--neg_num", type=int, default=5)
    ap.add_argument("--p", type=float, default=0.25)
    ap.add_argument("--q", type=float, default=0.25)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args(argv)

    if not os.path.exists(os.path.join(args.data_dir, "node_table")):
        cora_like(args.data_dir, n=1000, classes=7, feat_dim=64)
    g = (gl.Graph()
         .node(os.path.join(args.data_dir, "node_table"), "item",
               gl.Decoder(labeled=True, attr_types=["float"] * 64))
         .edge(os.path.join(args.data_dir, "edge_table"),
               ("item", "item", "relation"), gl.Decoder(weighted=True),
               directed=False)).init()

    q = (g.V("item").batch(args.batch_size).shuffle(traverse=True).alias("src")
         .random_walk(args.walk_len, p=args.p, q=args.q,
                      edge_type="relation").alias("walks").values())

    n = g.store.node_table("item").num_nodes
    tables = q.device_tables()
    key = jax.random.key(0)
    emb = jax.random.normal(key, (n, args.emb_dim)) * 0.1
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (n, args.emb_dim)) * 0.1
    params = {"emb": emb, "ctx": ctx}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tables_, seeds, key):
        ks, kn = jax.random.split(key)
        out = _execute(q, tables_, seeds, ks)
        walks = out["walks"].ids

        def lf(p):
            t, c, valid = skipgram_pairs(walks, args.window)
            te = p["emb"][jnp.maximum(t, 0)]
            ce = p["ctx"][jnp.maximum(c, 0)]
            pos = jnp.sum(te * ce, -1)
            negs = jax.random.randint(kn, t.shape + (args.neg_num,), 0, n)
            ne = p["ctx"][negs]
            neg = jnp.einsum("bpd,bpnd->bpn", te, ne)
            w = valid.astype(jnp.float32)
            loss = -(jax.nn.log_sigmoid(pos) * w).sum()
            loss -= (jax.nn.log_sigmoid(-neg) * w[..., None]).sum()
            return loss / jnp.maximum(w.sum(), 1.0)

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss

    from graph_learn_tpu.core.traversal import Traverser
    trav = Traverser(n, args.batch_size, "shuffle")
    k = jax.random.key(7)
    for epoch in range(args.epochs):
        losses = []
        while True:
            try:
                pos, _ = trav.next()
            except gl.OutOfRangeError:
                break
            k, sub = jax.random.split(k)
            params, opt_state, loss = step(params, opt_state, tables,
                                           jnp.asarray(pos, jnp.int32), sub)
            losses.append(float(loss))
        print("epoch %d loss %.4f" % (epoch, float(np.mean(losses))))

    # quality probe: label coherence of nearest embedding neighbors
    labels = g.store.node_table("item").labels
    e = np.asarray(params["emb"])
    e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-9)
    sims = e[:200] @ e.T
    np.fill_diagonal(sims[:, :200], -1)
    nn_idx = np.argmax(sims, axis=1)
    coherence = float((labels[:200] == labels[nn_idx]).mean())
    print("nn label coherence: %.3f (chance ~%.3f)"
          % (coherence, 1.0 / 7))
    return coherence


if __name__ == "__main__":
    main()
