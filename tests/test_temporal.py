"""Temporal graph: ts-sorted adjacency, before-t sampling, GSL threading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import EdgeTable
from graph_learn_tpu.ops.temporal import (temporal_full_sample,
                                          temporal_topk_sample,
                                          temporal_uniform_sample)


def _temporal_table(n=10):
    """node i -> (i+j)%n at time 10*i + j, j in 1..4."""
    src, dst, ts = [], [], []
    for i in range(n):
        for j in range(1, 5):
            src.append(i)
            dst.append((i + j) % n)
            ts.append(10 * i + j)
    return EdgeTable("e", "v", "v", Decoder(timestamped=True),
                     src=np.array(src), dst=np.array(dst),
                     num_src_nodes=n, num_dst_nodes=n,
                     timestamps=np.array(ts, np.int64))


def test_adjacency_sorted_by_ts():
    dev = _temporal_table().device()
    ro = np.asarray(dev.out.row_offsets)
    ts = np.asarray(dev.out.nbr_ts)
    for i in range(len(ro) - 1):
        seg = ts[ro[i]:ro[i + 1]]
        assert np.all(np.diff(seg) >= 0)


def test_temporal_uniform_respects_bound():
    dev = _temporal_table().device()
    et = _temporal_table()
    seeds = jnp.array([3, 3, 3, 3], jnp.int32)
    # node 3 edges at raw ts 31,32,33,34; bound raw-33 -> only 31,32.
    # bounds are in the store's rebased time domain (ts - ts_base).
    t = jnp.full((4,), 33 - et.ts_base, jnp.int64)
    ids, eids = temporal_uniform_sample(dev.out, seeds, 8,
                                        jax.random.key(0), t)
    got_ts = np.asarray(et.timestamps)[np.asarray(eids).ravel()]
    assert np.all(got_ts + et.ts_base < 33)


def test_temporal_zero_admissible():
    dev = _temporal_table().device()
    seeds = jnp.array([3], jnp.int32)
    t = jnp.array([5 - _temporal_table().ts_base], jnp.int64)  # all later
    ids, eids = temporal_uniform_sample(dev.out, seeds, 4,
                                        jax.random.key(0), t)
    assert np.all(np.asarray(eids) == -1)


def test_temporal_topk_most_recent():
    dev = _temporal_table().device()
    et = _temporal_table()
    seeds = jnp.array([5], jnp.int32)
    t = jnp.array([54 - et.ts_base], jnp.int64)  # admissible raw: 51,52,53
    ids, eids = temporal_topk_sample(dev.out, seeds, 2, t)
    got_ts = np.asarray(et.timestamps)[np.asarray(eids)[0]] + et.ts_base
    np.testing.assert_array_equal(got_ts, [53, 52])  # most recent first


def test_temporal_full():
    dev = _temporal_table().device()
    et = _temporal_table()
    ids, eids, degs = temporal_full_sample(
        dev.out, jnp.array([5], jnp.int32), 10,
        jnp.array([53 - et.ts_base], jnp.int64))
    assert int(degs[0]) == 2  # ts 51, 52


@pytest.fixture
def temporal_graph(tmp_path):
    n = 12
    node = tmp_path / "nodes"
    edge = tmp_path / "edges"
    with open(node, "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(n):
            f.write("%d\t%0.2f:%0.2f\n" % (i, i * 0.1, i * 0.2))
    with open(edge, "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\n")
        for i in range(n):
            for j in range(1, 4):
                f.write("%d\t%d\t%d\n" % (i, (i + j) % n, 100 * i + j))
    g = gl.Graph()
    g.node(str(node), node_type="v", decoder=gl.Decoder(attr_types=["float"] * 2))
    g.edge(str(edge), edge_type=("v", "v", "ev"),
           decoder=gl.Decoder(timestamped=True))
    return g.init()


def test_gsl_temporal_hops_bounded(temporal_graph):
    g = temporal_graph
    seed = g.E("ev").batch(6).alias("seed")
    src = seed.outV().alias("src")
    src.outV("ev").sample(4).by("random").alias("h1")
    out = gl.Dataset(seed.values(), window=1).next()
    seed_ts = np.asarray(out["seed"].timestamps)
    et = g.store.edge_table("ev")
    h1_eids = np.asarray(out["h1"].ids)  # node ids; need edge ts via value
    # verify via the hop's timestamps carried on the rec: re-run with full
    h1 = out["h1"]
    # sampled neighbors of src must come from edges with ts < seed edge ts
    # (we check via the store: all of src's edges with ts < bound)
    srcids = np.asarray(out["src"].ids)
    dev = et.device()
    ro = np.asarray(dev.out.row_offsets)
    nts = np.asarray(dev.out.nbr_ts)
    nbr = np.asarray(dev.out.nbr_ids)
    for i in range(6):
        s = srcids[i]
        admissible = set(nbr[ro[s]:ro[s + 1]][nts[ro[s]:ro[s + 1]] < seed_ts[i]])
        got = set(np.asarray(h1.ids)[i].tolist())
        if not admissible:
            assert got == {0}  # default fill
        else:
            assert got.issubset(admissible), (i, got, admissible)


@pytest.fixture
def temporal_bipartite(tmp_path):
    """Small timestamped bipartite event graph written as TSVs."""
    d = str(tmp_path)
    with open(d + "/u", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(8):
            f.write("%d\t%s\n" % (i, ":".join(["%.1f" % (i + k) for k in range(3)])))
    with open(d + "/i", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(6):
            f.write("%d\t%s\n" % (i, ":".join(["%.1f" % (i * 2 + k) for k in range(3)])))
    # interactions: user u hits item (u+j)%6 at t=5000+10*u+j
    with open(d + "/inter", "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\tfeature:string\n")
        for u in range(8):
            for j in range(3):
                f.write("%d\t%d\t%d\t0.5:0.5\n" % (u, (u + j) % 6,
                                                   5000 + 10 * u + j))
    # events (later time base -> different per-table min ts)
    with open(d + "/events", "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\tfeature:string\n")
        for u in range(8):
            f.write("%d\t%d\t%d\t1.0:1.0\n" % (u, u % 6, 6000 + u))
    edec = gl.Decoder(attr_types=["float"] * 2, timestamped=True)
    g = (gl.Graph()
         .node(d + "/u", "u", gl.Decoder(attr_types=["float"] * 3))
         .node(d + "/i", "i", gl.Decoder(attr_types=["float"] * 3))
         .edge(d + "/inter", ("u", "i", "inter"), edec, directed=False)
         .edge(d + "/events", ("u", "i", "ev"), edec)).init()
    return g


def test_global_ts_base_unified(temporal_bipartite):
    g = temporal_bipartite
    inter = g.store.edge_table("inter")
    ev = g.store.edge_table("ev")
    assert inter.ts_base == ev.ts_base == 5000
    # events keep their absolute offset relative to the global base
    assert int(ev.timestamps.min()) == 1000


def test_edge_hop_endpoint_and_temporal_threading(temporal_bipartite):
    """outE(...).inV() endpoint view + event-time-bounded neighbor hops."""
    g = temporal_bipartite
    q = (g.E("ev").batch(8).alias("event")
         .outV().alias("src")
         .outE("inter").sample(2).by("topk").alias("e1")
         .inV().alias("n1")
         .values())
    out = gl.Dataset(q, window=1).next()
    e1, n1 = out["e1"], out["n1"]
    assert e1.timestamps.shape == (8, 2)
    assert n1.ids.shape == (8, 2)
    # endpoint ids == the edges' dst view
    np.testing.assert_array_equal(np.asarray(n1.ids),
                                  np.asarray(e1.dst_nodes.ids))
    # every sampled interaction happens strictly BEFORE the event
    ev_tab = g.store.edge_table("ev")
    ev_ts = np.asarray(out["event"].timestamps)  # rebased, global base
    got = np.asarray(e1.timestamps)
    eids = np.asarray(e1.edge_ids)
    valid = eids >= 0
    assert np.all(got[valid] < ev_ts[:, None].repeat(2, 1)[valid])


def test_temporal_graph_struct(temporal_bipartite):
    from graph_learn_tpu.nn.data import TemporalGraph
    g = temporal_bipartite
    q = (g.E("ev").batch(8).alias("event")
         .outV().alias("src")
         .outE("inter").sample(2).by("topk").alias("src_nbr_1")
         .inV().alias("src_nbr_node_1")
         .values())
    out = gl.Dataset(q, window=1).next()
    tg = TemporalGraph.from_query_result(
        out, "src", ["src_nbr_1"], ["src_nbr_node_1"], "event")
    assert tg.src_t.shape == (8,)
    assert np.all(np.asarray(tg.src_t) == 0)
    assert tg.nbr_t[0].shape == (8, 2)
    # spans are positive (events strictly after their neighbors)
    eids = np.asarray(out["src_nbr_1"].edge_ids)
    assert np.all(np.asarray(tg.nbr_t[0])[eids >= 0] > 0)
    assert tg.nbr_nums == (2,)


def test_time_encoder_shape():
    from graph_learn_tpu.nn.models.tgat import TimeEncoder
    te = TimeEncoder(time_dim=6)
    t = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    p = te.init(jax.random.key(0), t)
    out = te.apply(p, t)
    assert out.shape == (12, 6)
    # t=0 rows encode to cos(phase) -- all in [-1, 1]
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)


def test_ts_base_stays_unified_after_expire_and_update(temporal_bipartite):
    """Rebuilds (TTL expire, online updates) must preserve the global
    timestamp base (code-review regression)."""
    from graph_learn_tpu.online.update import (UpdateBuffer, apply_updates,
                                               expire_edges)
    g = temporal_bipartite
    expire_edges(g, older_than=5005, edge_types=["inter"])
    bases = {t: tab.ts_base for t, tab in g.store.edges.items()
             if tab.timestamps is not None}
    assert len(set(bases.values())) == 1, bases
    # reverse twin was expired with the forward table
    assert g.store.edge_table("inter").num_edges == \
        g.store.edge_table("inter_reverse").num_edges
    buf = UpdateBuffer()
    buf.add_edges("ev", src_ids=[0], dst_ids=[1], timestamps=[7000])
    apply_updates(g, buf)
    bases = {t: tab.ts_base for t, tab in g.store.edges.items()
             if tab.timestamps is not None}
    assert len(set(bases.values())) == 1, bases
    # temporal causality still holds end-to-end after both rebuilds
    q = (g.E("ev").batch(8).alias("event").outV().alias("src")
         .outE("inter").sample(2).by("topk").alias("e1").values())
    out = gl.Dataset(q, window=1).next()
    ev_ts = np.asarray(out["event"].timestamps)
    e1 = np.asarray(out["e1"].timestamps)
    m = np.asarray(out["e1"].edge_ids) >= 0
    assert np.all(e1[m] < np.broadcast_to(ev_ts[:, None], e1.shape)[m])


def test_ts_overflow_coarsens_with_warning(tmp_path):
    """Global spans beyond int32 coarsen device timestamps (loudly)."""
    import warnings
    d = str(tmp_path)
    with open(d + "/n", "w") as f:
        f.write("id:int64\n")
        for i in range(4):
            f.write("%d\n" % i)
    with open(d + "/e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\ttimestamp:int64\n")
        # ms-epoch-ish stamps spanning ~80 days > 2^31 ms
        for i in range(4):
            f.write("%d\t%d\t%d\n" % (i, (i + 1) % 4,
                                      1_600_000_000_000 + i * 2_000_000_000))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        g = (gl.Graph().node(d + "/n", "v", gl.Decoder())
             .edge(d + "/e", ("v", "v", "e"),
                   gl.Decoder(timestamped=True))).init()
        assert any("coarsening" in str(x.message) for x in w)
    et = g.store.edge_table("e")
    assert et.ts_scale > 1
    assert int(et.timestamps.max()) < 2**31
    # absolute time reconstructable at the coarsened resolution
    approx = et.timestamps.astype(np.int64) * et.ts_scale + et.ts_base
    assert abs(int(approx[0]) - 1_600_000_000_000) < et.ts_scale


def test_neg_tower_inherits_event_time(temporal_bipartite):
    """Negatives carry the seed's timestamp so their hops are bounded by
    the event (code-review regression: TGAT neg-tower leakage)."""
    g = temporal_bipartite
    q = (g.E("ev").batch(8).alias("event").outV().alias("src")
         .outNeg("inter").sample(1).by("random").alias("neg")
         .outE("inter_reverse").sample(2).by("topk").alias("nege")
         .values())
    out = gl.Dataset(q, window=1).next()
    ev_ts = np.asarray(out["event"].timestamps)
    nege = np.asarray(out["nege"].timestamps)  # [b, 1, 2]
    m = np.asarray(out["nege"].edge_ids) >= 0
    bound = np.broadcast_to(ev_ts[:, None, None], nege.shape)
    assert np.all(nege[m] < bound[m])


def test_custom_sampler_temporal_guard(temporal_bipartite):
    """Custom strategies must opt in to t_upper on temporal paths."""
    import jax.numpy as jnp
    from graph_learn_tpu.errors import InvalidArgumentError
    from graph_learn_tpu.ops.sampling import STRATEGY_FNS, register_sampler
    from graph_learn_tpu.ops.temporal import temporal_topk_sample

    def no_t(csr, seeds, k, key):
        raise AssertionError("should not be called on temporal path")

    def with_t(csr, seeds, k, key, t_upper=None):
        return temporal_topk_sample(csr, seeds, k, t_upper)

    if "no_t" not in STRATEGY_FNS:
        register_sampler("no_t", no_t)
    if "with_t" not in STRATEGY_FNS:
        register_sampler("with_t", with_t)
    g = temporal_bipartite
    q = (g.E("ev").batch(4).alias("event").outV().alias("src")
         .outE("inter").sample(2).by("no_t").alias("e1").values())
    with pytest.raises(InvalidArgumentError):
        gl.Dataset(q, window=1).next()
    q2 = (g.E("ev").batch(4).alias("event").outV().alias("src")
          .outE("inter").sample(2).by("with_t").alias("e1").values())
    out = gl.Dataset(q2, window=1).next()
    assert out["e1"].edge_ids.shape == (4, 2)
