"""SEAL link prediction: enclosing subgraphs + DRNL-style distance labels.

Parity with graphlearn/examples/tf/seal (SubGraph sampling with BFS
dist-to-src/dst, subgraph_sampler.cc:27-80; GCN over BatchGraph + readout
+ binary link loss; hits-style eval).
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
from graph_learn_tpu.nn.models.sub_models import GCN, LinkPredictor
from graph_learn_tpu.nn.subgraph_data import BatchGraph
from graph_learn_tpu.ops.sampling import uniform_sample
from graph_learn_tpu.ops.negative import negative_sample
from graph_learn_tpu.ops.subgraph import induce_batched


def build_pair_subgraphs(dev_et, feats, src, dst, key, nbrs=6, steps=2):
    """[b] src/dst -> BatchGraph of enclosing subgraphs w/ dist labels."""
    k1, k2 = jax.random.split(key)
    sn, _ = uniform_sample(dev_et.out, src, nbrs, k1)
    dn, _ = uniform_sample(dev_et.out, dst, nbrs, k2)
    # per-sample seed set: [src, dst, src nbrs..., dst nbrs...]
    seeds = jnp.concatenate([src[:, None], dst[:, None], sn, dn], axis=1)
    sg = induce_batched(dev_et.out, seeds, nbr_cap=nbrs * 2 + 2,
                        need_dist=True, num_bfs_steps=steps)
    # local indices of src/dst inside the sorted unique node set differ per
    # sample; BFS roots in ops/subgraph are local nodes 0/1 — recompute
    # dist labels from actual src/dst positions instead:
    bg = BatchGraph.from_subgraphs(sg)
    x = feats[bg.node_ids]
    # DRNL-lite: one-hot of clipped distances to the two roots
    ds = jnp.clip(bg.dist_to_src, 0, steps + 1)
    dd = jnp.clip(bg.dist_to_dst, 0, steps + 1)
    lab = jax.nn.one_hot(ds, steps + 2) + 2.0 * jax.nn.one_hot(dd, steps + 2)
    x = jnp.concatenate([x, lab], axis=-1)
    x = jnp.where(bg.node_mask[:, None], x, 0.0)
    return bg, x


def _read_edge_tsv(path):
    e = np.loadtxt(path, skiprows=1, usecols=(0, 1), dtype=np.int64,
                   ndmin=2)
    return e


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_cora_like")
    ap.add_argument("--collab_dir", default=None,
                    help="ogbl-collab tables from examples/data/"
                         "ogbl_collab.py; enables the hits@50 eval "
                         "(reference seal/README.md:19-21 hits@50~0.49)")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--feat_dim", type=int, default=64)
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args(argv)

    test_pos = test_neg = None
    if args.collab_dir:
        d = args.collab_dir
        args.feat_dim = 128
        g = (gl.Graph()
             .node(os.path.join(d, "ogbl_collab_node"), "item",
                   gl.Decoder(attr_types=["float"] * 128))
             .edge(os.path.join(d, "ogbl_collab_train_edge"),
                   ("item", "item", "relation"),
                   gl.Decoder(weighted=True), directed=False)).init()
        test_pos = _read_edge_tsv(os.path.join(d, "ogbl_collab_test_edge"))
        test_neg = _read_edge_tsv(
            os.path.join(d, "ogbl_collab_test_edge_neg"))
    else:
        if not os.path.exists(os.path.join(args.data_dir, "node_table")):
            cora_like(args.data_dir, n=1000, classes=7,
                      feat_dim=args.feat_dim)
        g = (gl.Graph()
             .node(os.path.join(args.data_dir, "node_table"), "item",
                   gl.Decoder(labeled=True,
                              attr_types=["float"] * args.feat_dim))
             .edge(os.path.join(args.data_dir, "edge_table"),
                   ("item", "item", "relation"), gl.Decoder(weighted=True),
                   directed=False)).init()

    et = g.store.edge_table("relation")
    dev = et.device()
    feats = jnp.asarray(g.store.node_table("item").float_attrs)
    n_edges = et.num_edges
    dist_feat = 4  # steps + 2 with steps=2
    model = GCN([args.hidden, args.hidden])
    scorer = LinkPredictor(hidden_dim=args.hidden)

    key = jax.random.key(0)
    bg0, x0 = build_pair_subgraphs(dev, feats, dev.src[:args.batch_size],
                                   dev.dst[:args.batch_size], key)
    params = {
        "gcn": model.init(jax.random.key(1), bg0.edge_index, x0,
                          edge_mask=bg0.edge_mask),
        "mlp": None,
    }
    h0 = model.apply(params["gcn"], bg0.edge_index, x0,
                     edge_mask=bg0.edge_mask)
    r0 = bg0.readout(h0)
    params["mlp"] = scorer.init(jax.random.key(2), r0, r0)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, eidx, key):
        kpos, kneg, ksg1, ksg2 = jax.random.split(key, 4)
        src = dev.src[eidx]
        dst = dev.dst[eidx]
        neg_dst = negative_sample(dev, src, 1, kneg, "random")[:, 0]

        def score(p, s, d, k):
            bg, x = build_pair_subgraphs(dev, feats, s, d, k)
            h = model.apply(p["gcn"], bg.edge_index, x,
                            edge_mask=bg.edge_mask)
            r = bg.readout(h)
            return scorer.apply(p["mlp"], r, r)

        def lf(p):
            pos_logit = score(p, src, dst, ksg1)
            neg_logit = score(p, src, neg_dst, ksg2)
            return (optax.sigmoid_binary_cross_entropy(
                        pos_logit, jnp.ones_like(pos_logit)).mean()
                    + optax.sigmoid_binary_cross_entropy(
                        neg_logit, jnp.zeros_like(neg_logit)).mean()), \
                   (pos_logit, neg_logit)

        (loss, (pl, nl)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt_state2 = opt.update(grads, opt_state, params)
        auc_proxy = (pl[:, None] > nl[None, :]).mean()
        return optax.apply_updates(params, upd), opt_state2, loss, auc_proxy

    rng = np.random.default_rng(0)
    k = jax.random.key(5)
    for i in range(args.steps):
        eidx = jnp.asarray(rng.integers(0, n_edges, args.batch_size),
                           jnp.int32)
        k, sub = jax.random.split(k)
        params, opt_state, loss, auc = step(params, opt_state, eidx, sub)
        if i % 30 == 0 or i == args.steps - 1:
            print("step %d loss %.4f pairwise-auc %.3f"
                  % (i, float(loss), float(auc)))

    if test_pos is not None:
        # OGB hits@50: fraction of positive test edges scored above the
        # 50th-highest negative score (reference seal/README.md:19-21)
        @jax.jit
        def score_batch(p, s, d, kk):
            bg, x = build_pair_subgraphs(dev, feats, s, d, kk)
            h = model.apply(p["gcn"], bg.edge_index, x,
                            edge_mask=bg.edge_mask)
            r = bg.readout(h)
            return scorer.apply(p["mlp"], r, r).reshape(-1)

        index = g.store.node_table("item").index

        def score_edges(e):
            bs = args.batch_size
            npad = (-len(e)) % bs
            ep = np.concatenate([e, e[:1].repeat(npad, 0)]) if npad else e
            kk = jax.random.key(77)
            outs = []
            for off in range(0, len(ep), bs):
                kk, sub = jax.random.split(kk)
                s = index.lookup(ep[off:off + bs, 0]).astype(np.int32)
                t = index.lookup(ep[off:off + bs, 1]).astype(np.int32)
                outs.append(np.asarray(score_batch(
                    params, jnp.asarray(s), jnp.asarray(t), sub)))
            return np.concatenate(outs)[:len(e)]

        ps = score_edges(test_pos)
        ns = score_edges(test_neg)
        kth = np.sort(ns)[-min(50, len(ns))]
        hits = float((ps > kth).mean())
        print("hits@50: %.4f" % hits)
        return hits
    return float(auc)


if __name__ == "__main__":
    main()
