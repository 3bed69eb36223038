"""TGN-style temporal link prediction with node memory.

Parity with graphlearn/examples/pytorch/tgn
(temporal_batch_loader.py:26-82 time-ordered event batches;
train_and_eval.py:38-46 memory module + temporal neighbors): events stream
in timestamp order; each node keeps a GRU memory updated by its events;
link scores combine memory with recency-topk temporal neighbors
(ops/temporal.py).  Negative dsts are drawn per event.
"""

import argparse
import os

from common import ensure_platform

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

import graph_learn_tpu as gl
from graph_learn_tpu.ops.negative import negative_sample
from graph_learn_tpu.ops.temporal import temporal_topk_sample


def gen_temporal_u2i(path, n_u=200, n_i=150, events=4000, seed=0):
    """Interaction stream with latent preference clusters drifting in time."""
    rng = np.random.default_rng(seed)
    cu = rng.integers(0, 4, n_u)
    ci = rng.integers(0, 4, n_i)
    centers = rng.normal(0, 1.5, (4, 8))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "user_table"), "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(n_u):
            feat = centers[cu[i]] + rng.normal(0, 0.5, 8)
            f.write("%d\t%s\n" % (i, ":".join("%.3f" % x for x in feat)))
    with open(os.path.join(path, "item_table"), "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(n_i):
            feat = centers[ci[i]] + rng.normal(0, 0.5, 8)
            f.write("%d\t%s\n" % (i + 100000,
                                    ":".join("%.3f" % x for x in feat)))
    with open(os.path.join(path, "event_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\n")
        for t in range(events):
            u = rng.integers(0, n_u)
            pool = np.where(ci == cu[u])[0]
            i = pool[rng.integers(0, pool.size)] if pool.size else \
                rng.integers(0, n_i)
            f.write("%d\t%d\t%d\n" % (u, i + 100000, 1000 + t))
    return n_u, n_i


class TGNScorer(nn.Module):
    mem_dim: int

    @nn.compact
    def __call__(self, u_mem, i_mem, u_nbr_mem, i_feat):
        # aggregate recency-neighborhood memory + own memory; item side
        # combines memory with static features (TGN embeds memory+features)
        ctx = jnp.mean(u_nbr_mem, axis=1)
        h_u = nn.Dense(self.mem_dim, name="proj_u")(
            jnp.concatenate([u_mem, ctx], -1))
        h_i = nn.Dense(self.mem_dim, name="proj_i")(
            jnp.concatenate([i_mem, i_feat], -1))
        return jnp.sum(h_u * h_i, -1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/glt_tgn")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--mem_dim", type=int, default=32)
    ap.add_argument("--nbrs", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--lr", type=float, default=0.003)
    args = ap.parse_args(argv)

    if not os.path.exists(os.path.join(args.data_dir, "event_table")):
        gen_temporal_u2i(args.data_dir)
    g = (gl.Graph()
         .node(os.path.join(args.data_dir, "user_table"), "u",
               gl.Decoder(attr_types=["float"] * 8))
         .node(os.path.join(args.data_dir, "item_table"), "i",
               gl.Decoder(attr_types=["float"] * 8))
         .edge(os.path.join(args.data_dir, "event_table"), ("u", "i", "ev"),
               gl.Decoder(timestamped=True))).init()

    et = g.store.edge_table("ev")
    dev = et.device()
    n_u, n_i = et.num_src_nodes, et.num_dst_nodes
    # time-ordered event stream (temporal_batch_loader parity)
    order = np.argsort(et.timestamps, kind="stable")

    scorer = TGNScorer(args.mem_dim)
    gru = nn.GRUCell(features=args.mem_dim)
    d0 = jnp.zeros((1, args.mem_dim))
    params = {
        "scorer": scorer.init(jax.random.key(0), d0, d0,
                              jnp.zeros((1, args.nbrs, args.mem_dim)),
                              jnp.zeros((1, 8))),
        "gru": gru.init(jax.random.key(1), d0, jnp.zeros((1, 2 * args.mem_dim))),
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mem_u, mem_i, eidx, key):
        uu = dev.src[eidx]
        ii = dev.dst[eidx]
        ts = dev.timestamps[eidx]
        neg = negative_sample(dev, uu, 1, key, "random")[:, 0]
        # recency neighbors of u strictly before the event
        nbr_i, _ = temporal_topk_sample(dev.out, uu, args.nbrs, ts)

        def lf(p):
            # GRU-refresh the user memory with its most recent prior
            # neighbor's memory — puts the GRU in the loss path (TGN
            # trains its memory updater through the prediction loss)
            nbr_m = mem_i[jnp.maximum(nbr_i, 0)]
            last_msg = jnp.concatenate([mem_u[uu], nbr_m[:, 0]], -1)
            u_m, _ = gru.apply(p["gru"], mem_u[uu], last_msg)
            i_m = mem_i[ii]
            n_m = mem_i[neg]
            pos = scorer.apply(p["scorer"], u_m, i_m, nbr_m, i_feat[ii])
            negs = scorer.apply(p["scorer"], u_m, n_m, nbr_m, i_feat[neg])
            loss = optax.sigmoid_binary_cross_entropy(
                pos, jnp.ones_like(pos)).mean()
            loss += optax.sigmoid_binary_cross_entropy(
                negs, jnp.zeros_like(negs)).mean()
            return loss, (pos, negs)

        (loss, (pos, negs)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        upd, opt_state2 = opt.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, upd)
        # memory update AFTER scoring (no label leakage): message = concat
        # of the two endpoint memories, GRU applied per endpoint
        msg_u = jnp.concatenate([mem_u[uu], mem_i[ii]], -1)
        msg_i = jnp.concatenate([mem_i[ii], mem_u[uu]], -1)
        new_u, _ = gru.apply(params["gru"], mem_u[uu], msg_u)
        new_i, _ = gru.apply(params["gru"], mem_i[ii], msg_i)
        mem_u2 = mem_u.at[uu].set(new_u)
        mem_i2 = mem_i.at[ii].set(new_i)
        auc = (pos > negs).mean()  # paired per event
        return params2, opt_state2, mem_u2, mem_i2, loss, auc

    # feature-seeded memories (zero init makes all nodes indistinguishable)
    proj = jax.random.normal(jax.random.key(42), (8, args.mem_dim)) * 0.5
    u_feat = jnp.asarray(g.store.node_table("u").float_attrs)
    i_feat = jnp.asarray(g.store.node_table("i").float_attrs)
    for epoch in range(args.epochs):
        mem_u = u_feat @ proj
        mem_i = i_feat @ proj
        k = jax.random.key(7 + epoch)
        aucs, losses = [], []
        for off in range(0, len(order) - args.batch_size, args.batch_size):
            eidx = jnp.asarray(order[off:off + args.batch_size], jnp.int32)
            k, sub = jax.random.split(k)
            params, opt_state, mem_u, mem_i, loss, auc = step(
                params, opt_state, mem_u, mem_i, eidx, sub)
            losses.append(float(loss))
            aucs.append(float(auc))
        print("epoch %d loss %.4f pairwise-auc %.3f (last quarter %.3f)"
              % (epoch, np.mean(losses), np.mean(aucs),
                 np.mean(aucs[-len(aucs) // 4:])))
    return float(np.mean(aucs[-len(aucs) // 4:]))


if __name__ == "__main__":
    main()
