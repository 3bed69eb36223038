"""Temporal x weighted sampling semantics (VERDICT round-1 Weak #1).

The reference composes the timestamp LARGER_THAN filter with EVERY
sampler (sampler/filter.h + edge_weight_sampler.cc / in_degree_sampler.cc /
random_without_replacement_sampler.cc); round 1 silently routed weighted
strategies to uniform on temporal paths.  Each test here compares the
device sampler's empirical distribution over the before-t prefix against
an exact numpy oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable
from graph_learn_tpu.ops.temporal import (
    temporal_weighted_sample, temporal_without_replacement_sample)


def _table(n=6, deg=8, weights_of=lambda i, j: float(j + 1), big=False):
    """node i -> (i+j)%n at time 10*i + j (ts-ascending rows), weighted.

    big=True pads one hub row so max_degree > 256 and the window path is
    disabled — both code paths (windowed count / bisection) get covered.
    """
    src, dst, ts, w = [], [], [], []
    for i in range(n):
        for j in range(deg):
            src.append(i)
            dst.append((i + j) % n)
            ts.append(10 * i + j)
            w.append(weights_of(i, j))
    if big:
        for j in range(300):
            src.append(n - 1)
            dst.append(j % n)
            ts.append(10 * n + j)
            w.append(1.0)
    return EdgeTable("e", "v", "v",
                     Decoder(weighted=True, timestamped=True),
                     src=np.array(src), dst=np.array(dst),
                     num_src_nodes=n, num_dst_nodes=n,
                     weights=np.array(w, np.float32),
                     timestamps=np.array(ts, np.int64))


@pytest.mark.parametrize("big", [False, True])
def test_temporal_edge_weight_matches_oracle(big):
    et = _table(big=big)
    dev = et.device()
    seed, cut = 2, 5  # node 2: edges j=0..7 at ts 20..27; prefix j<5
    b = 4096
    seeds = jnp.full((b,), seed, jnp.int32)
    t = jnp.full((b,), (10 * seed + cut) - et.ts_base, jnp.int64)
    ids, eids = temporal_weighted_sample(dev.out, seeds, 2,
                                         jax.random.key(0), t)
    eids = np.asarray(eids).ravel()
    assert np.all(eids >= 0)
    got_ts = np.asarray(et.timestamps)[eids] + et.ts_base
    assert np.all(got_ts < 10 * seed + cut)
    # empirical frequency ~ w_j / W_prefix  (w = j+1, prefix j in 0..4)
    wpre = np.arange(1, cut + 1, dtype=np.float64)
    expect = wpre / wpre.sum()
    j_of = got_ts - 10 * seed
    freq = np.bincount(j_of, minlength=cut)[:cut] / eids.size
    np.testing.assert_allclose(freq, expect, atol=0.03)


def test_temporal_in_degree_matches_oracle():
    # weights constant; dst in-degree differs: make node 0 a popular dst
    n, deg = 6, 8
    src, dst, ts = [], [], []
    for i in range(n):
        for j in range(deg):
            src.append(i)
            dst.append(0 if j % 2 == 0 else (i + j) % n)
            ts.append(10 * i + j)
    et = EdgeTable("e", "v", "v", Decoder(weighted=True, timestamped=True),
                   src=np.array(src), dst=np.array(dst),
                   num_src_nodes=n, num_dst_nodes=n,
                   weights=np.ones(len(src), np.float32),
                   timestamps=np.array(ts, np.int64))
    dev = et.device()
    seed, cut = 3, 6
    b = 4096
    seeds = jnp.full((b,), seed, jnp.int32)
    t = jnp.full((b,), (10 * seed + cut) - et.ts_base, jnp.int64)
    ids, eids = temporal_weighted_sample(dev.out, seeds, 2,
                                         jax.random.key(1), t,
                                         by="in_degree")
    eids = np.asarray(eids).ravel()
    got_ts = np.asarray(et.timestamps)[eids] + et.ts_base
    assert np.all(got_ts < 10 * seed + cut)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    # oracle over the prefix (CSR rows are ts-sorted = insertion order here)
    pre_dst = [dst[seed * deg + j] for j in range(cut)]
    wpre = indeg[pre_dst]
    expect = wpre / wpre.sum()
    j_of = got_ts - 10 * seed
    freq = np.bincount(j_of, minlength=cut)[:cut] / eids.size
    np.testing.assert_allclose(freq, expect, atol=0.03)


def test_temporal_without_replacement_distinct_and_uniform():
    et = _table()
    dev = et.device()
    seed, cut = 1, 6
    b = 3000
    seeds = jnp.full((b,), seed, jnp.int32)
    t = jnp.full((b,), (10 * seed + cut) - et.ts_base, jnp.int64)
    k = 3
    ids, eids = temporal_without_replacement_sample(
        dev.out, seeds, k, jax.random.key(2), t)
    eids = np.asarray(eids)
    got_ts = np.asarray(et.timestamps)[eids] + et.ts_base
    assert np.all(got_ts < 10 * seed + cut)
    # distinct within each draw (deg=6 > k=3)
    for row in eids:
        assert len(set(row.tolist())) == k, row
    # marginal inclusion uniform: each prefix edge included w.p. k/cut
    j_of = got_ts - 10 * seed
    freq = np.bincount(j_of.ravel(), minlength=cut)[:cut] / (b * k)
    np.testing.assert_allclose(freq, np.full(cut, 1.0 / cut), atol=0.02)


def test_temporal_wor_small_prefix_returns_all():
    et = _table()
    dev = et.device()
    seed, cut = 4, 2  # prefix of 2 < k=4 -> all prefix edges, padded
    seeds = jnp.full((8,), seed, jnp.int32)
    t = jnp.full((8,), (10 * seed + cut) - et.ts_base, jnp.int64)
    ids, eids = temporal_without_replacement_sample(
        dev.out, seeds, 4, jax.random.key(3), t)
    got_ts = np.asarray(et.timestamps)[np.asarray(eids).ravel()] + et.ts_base
    assert np.all(got_ts < 10 * seed + cut)
    assert set((got_ts - 10 * seed).tolist()) == {0, 1}


def test_temporal_weighted_zero_admissible_fills_default():
    et = _table()
    dev = et.device()
    seeds = jnp.array([3], jnp.int32)
    t = jnp.array([5 - et.ts_base], jnp.int64)  # all of node 3's are later
    ids, eids = temporal_weighted_sample(dev.out, seeds, 4,
                                         jax.random.key(0), t)
    assert np.all(np.asarray(eids) == -1)
    ids2, eids2 = temporal_without_replacement_sample(
        dev.out, seeds, 4, jax.random.key(0), t)
    assert np.all(np.asarray(eids2) == -1)


def _ts_graph(tmp_path, weighted=True):
    d = str(tmp_path)
    with open(d + "/n", "w") as f:
        f.write("id:int64\n")
        for i in range(8):
            f.write("%d\n" % i)
    with open(d + "/e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\ttimestamp:int64\n")
        for i in range(8):
            for j in range(5):
                f.write("%d\t%d\t%f\t%d\n"
                        % (i, (i + j + 1) % 8, float(j + 1), 100 * i + j))
    return (gl.Graph().node(d + "/n", "v", gl.Decoder())
            .edge(d + "/e", ("v", "v", "e"),
                  gl.Decoder(weighted=True, timestamped=True))).init()


def test_gsl_temporal_weighted_routes_and_bounds(tmp_path):
    """End-to-end: .sample().by('edge_weight') on a temporal path is both
    time-bounded AND weight-proportional (not silently uniform)."""
    g = _ts_graph(tmp_path)
    q = (g.E("e").batch(8).alias("ev").outV().alias("src")
         .outE("e").sample(64).by("edge_weight").alias("h1").values())
    out = gl.Dataset(q, window=1).next()
    ev_ts = np.asarray(out["ev"].timestamps)
    h1_ts = np.asarray(out["h1"].timestamps)
    eids = np.asarray(out["h1"].edge_ids)
    m = eids >= 0
    assert np.all(h1_ts[m] < np.broadcast_to(ev_ts[:, None], h1_ts.shape)[m])
    # seeds drawn in order: row i of the batch is edge i = (src 0, j=i).
    # For the seed with 4 admissible prefix edges (j=0..3, w=1..4) the
    # highest-weight admissible edge must dominate the lowest ~4:1.
    row = 4  # seed edge (0, j=4): prefix j=0..3
    w_of = np.asarray(g.store.edge_table("e").weights)
    got_w = w_of[eids[row][eids[row] >= 0]]
    c_hi = (got_w == 4.0).sum()
    c_lo = max((got_w == 1.0).sum(), 1)
    assert c_hi / c_lo > 2.0, (c_hi, c_lo)
