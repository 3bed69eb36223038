"""Edge-partitioned sharded SpMM vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable
from graph_learn_tpu.parallel.halo import sharded_spmm
from graph_learn_tpu.parallel.mesh import make_mesh
from graph_learn_tpu.parallel.partition import partition_edges, shard_features


def _random_graph(n, e, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32) if weighted else None
    et = EdgeTable("e", "v", "v", Decoder(weighted=weighted), src=src,
                   dst=dst, num_src_nodes=n, num_dst_nodes=n, weights=w)
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    return et, feats, src, dst, w


def _dense_ref(n, src, dst, feats, agg, w=None):
    out = np.zeros((n, feats.shape[1]), np.float32)
    cnt = np.zeros(n, np.float32)
    for s, d in zip(src, dst):
        out[d] += feats[s]
        cnt[d] += 1
    if agg == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    return out


@pytest.mark.parametrize("agg", ["sum", "mean"])
def test_sharded_spmm_matches_dense(agg):
    n, e, p = 64, 400, 8
    et, feats, src, dst, w = _random_graph(n, e)
    sg = partition_edges(et, p)
    assert sg.rows_per_shard * p >= n
    xs = jnp.asarray(shard_features(feats, p))
    mesh = make_mesh(n_data=1, n_graph=p)
    out = sharded_spmm(sg, xs, mesh, agg=agg)
    got = np.asarray(out).reshape(-1, 8)[:n]
    ref = _dense_ref(n, src, dst, feats, agg)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sharded_spmm_uneven_nodes():
    # n not divisible by P exercises tail padding
    n, e, p = 53, 300, 8
    et, feats, src, dst, w = _random_graph(n, e, seed=3)
    sg = partition_edges(et, p)
    xs = jnp.asarray(shard_features(feats, p))
    mesh = make_mesh(n_data=1, n_graph=p)
    out = sharded_spmm(sg, xs, mesh, agg="sum")
    got = np.asarray(out).reshape(-1, 8)[:n]
    ref = _dense_ref(n, src, dst, feats, "sum")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_partition_halo_plan_consistency():
    n, e, p = 40, 200, 4
    et, feats, src, dst, w = _random_graph(n, e, seed=7)
    sg = partition_edges(et, p)
    rows = sg.rows_per_shard
    send_counts = np.asarray(sg.send_counts)
    recv = np.asarray(sg.recv_offsets)
    # total sent to q == q's halo size == recv_offsets[q, -1]
    for q in range(p):
        assert send_counts[:, q].sum() == recv[q, -1]
    # no self-sends
    assert np.all(np.diag(send_counts) == 0)


def test_full_graph_gcn_trains():
    import optax
    from graph_learn_tpu.parallel.full_graph import (ShardedGCN,
                                                     make_full_graph_train_step)
    n, e, p = 64, 500, 8
    rng = np.random.default_rng(11)
    # homophilous labels: two blocks
    labels_full = (np.arange(n) < n // 2).astype(np.int32)
    src = rng.integers(0, n, e)
    dst = np.where(rng.random(e) < 0.9,
                   (src + rng.integers(1, n // 2, e)) % (n // 2)
                   + (src >= n // 2) * (n // 2),
                   rng.integers(0, n, e))
    from graph_learn_tpu.core.store import EdgeTable
    from graph_learn_tpu.core.schema import Decoder
    et = EdgeTable("e", "v", "v", Decoder(), src=src, dst=dst,
                   num_src_nodes=n, num_dst_nodes=n)
    feats = (labels_full[:, None] * 2.0 - 1.0) + \
        rng.standard_normal((n, 8)).astype(np.float32) * 2.0
    feats = feats.astype(np.float32)

    sg = partition_edges(et, p)
    mesh = make_mesh(n_data=1, n_graph=p)
    xs = jnp.asarray(shard_features(feats, p))
    rows = sg.rows_per_shard
    lab = np.pad(labels_full, (0, p * rows - n)).reshape(p, rows)
    msk = np.pad(np.ones(n, np.float32), (0, p * rows - n)).reshape(p, rows)

    model = ShardedGCN(dims=[16, 2], sg=sg, mesh=mesh)
    params = model.init(jax.random.key(0), xs)

    def loss_fn(logits, labels, mask):
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, 2), labels.reshape(-1))
        m = mask.reshape(-1)
        return jnp.sum(ls * m) / jnp.sum(m)

    opt = optax.adam(0.02)
    step = make_full_graph_train_step(model, opt, mesh, loss_fn)
    opt_state = opt.init(params)
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, xs,
                                       jnp.asarray(lab), jnp.asarray(msk))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
