"""UltraGCN: constraint-weighted MF for recommendation.

Parity with graphlearn/examples/tf/ultra_gcn (UltraGCN: embedding-only
model whose BCE loss is weighted by degree-derived constraint
coefficients beta_ui = (1/d_u) * sqrt((d_u+1)/(d_i+1)) — approximating
GCN message passing without propagation; item-item co-occurrence
constraint from the i-i graph; Recall@20 eval).
"""

import argparse
import os

from common import ensure_platform

import jax
import jax.numpy as jnp
import numpy as np
import optax

import graph_learn_tpu as gl
from data.synthetic import u2i
from graph_learn_tpu.ops.negative import negative_sample
from graph_learn_tpu.ops.sampling import topk_sample


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_u2i_ex")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--emb_dim", type=int, default=64)
    ap.add_argument("--neg_num", type=int, default=20)
    ap.add_argument("--w_ii", type=float, default=1.0)
    ap.add_argument("--ii_k", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.005)
    args = ap.parse_args(argv)

    if not os.path.exists(os.path.join(args.data_dir, "user_table")):
        u2i(args.data_dir, feat_dim=16)
    g = (gl.Graph()
         .node(os.path.join(args.data_dir, "user_table"), "u",
               gl.Decoder(attr_types=["float"] * 16))
         .node(os.path.join(args.data_dir, "item_table"), "i",
               gl.Decoder(attr_types=["float"] * 16))
         .edge(os.path.join(args.data_dir, "u2i_table"), ("u", "i", "u-i"),
               gl.Decoder(weighted=True))
         .edge(os.path.join(args.data_dir, "i2i_table"), ("i", "i", "i-i"),
               gl.Decoder(weighted=True))).init()

    et = g.store.edge_table("u-i")
    dev = et.device()
    ii_dev = g.store.edge_table("i-i").device()
    n_u, n_i = et.num_src_nodes, et.num_dst_nodes
    du = jnp.asarray(et.out_degrees, jnp.float32)
    di = jnp.asarray(et.in_degrees, jnp.float32)

    key = jax.random.key(0)
    params = {
        "u": jax.random.normal(key, (n_u, args.emb_dim)) * 0.1,
        "i": jax.random.normal(jax.random.fold_in(key, 1),
                               (n_i, args.emb_dim)) * 0.1,
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, eidx, k):
        kneg, kii = jax.random.split(k)
        uu = dev.src[eidx]
        ii = dev.dst[eidx]
        neg = negative_sample(dev, uu, args.neg_num, kneg, "random")
        # UltraGCN constraint weights
        beta_pos = (1.0 / jnp.maximum(du[uu], 1.0)) * jnp.sqrt(
            (du[uu] + 1.0) / (di[ii] + 1.0))
        beta_neg = (1.0 / jnp.maximum(du[uu], 1.0))[:, None] * jnp.sqrt(
            (du[uu][:, None] + 1.0) / (di[neg] + 1.0))
        # item-item constraint neighbors (top co-occurrence)
        ii_nbrs, _ = topk_sample(ii_dev.out, ii, args.ii_k)

        def lf(p):
            ue = p["u"][uu]
            pe = p["i"][ii]
            ne = p["i"][neg]
            pos_logit = jnp.sum(ue * pe, -1)
            neg_logit = jnp.einsum("bd,bnd->bn", ue, ne)
            loss = jnp.mean(
                (1.0 + beta_pos) * optax.sigmoid_binary_cross_entropy(
                    pos_logit, jnp.ones_like(pos_logit)))
            loss += jnp.mean(
                (1.0 + beta_neg) * optax.sigmoid_binary_cross_entropy(
                    neg_logit, jnp.zeros_like(neg_logit)))
            # i-i constraint: pull item towards co-items the user likes
            ce = p["i"][ii_nbrs]  # [b, k, d]
            ii_logit = jnp.einsum("bd,bkd->bk", ue, ce)
            loss += args.w_ii * jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    ii_logit, jnp.ones_like(ii_logit)))
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss

    rng = np.random.default_rng(0)
    k = jax.random.key(3)
    for i in range(args.steps):
        eidx = jnp.asarray(rng.integers(0, et.num_edges, args.batch_size),
                           jnp.int32)
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, eidx, sub)
        if i % 100 == 0:
            print("step %d loss %.4f" % (i, float(loss)))

    # Recall@20
    scores = np.asarray(params["u"] @ params["i"].T)
    top = np.argsort(-scores, axis=1)[:, :20]
    truth = {}
    for s, d in zip(et.src, et.dst):
        truth.setdefault(int(s), set()).add(int(d))
    hits = total = 0
    for u in range(n_u):
        t = truth.get(u, set())
        if not t:
            continue
        hits += len(set(top[u].tolist()) & t)
        total += min(len(t), 20)
    recall = hits / max(total, 1)
    print("recall@20: %.4f" % recall)
    return recall


if __name__ == "__main__":
    main()
