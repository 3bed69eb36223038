"""Deferred deepest-hop aggregation: sorted segment gather == plain path.

The fused-step optimisation for the big-graph frontier (PERF.md rule 5):
``EgoGraph.from_query_result(..., defer_last_table=...)`` +
``ops.aggregate.gather_group_agg``.  Every test pins equivalence against
the materialised reshape-reduce path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.values import Nodes
from graph_learn_tpu.nn.data import DeferredRows, EgoGraph
from graph_learn_tpu.nn.models.ego_gnn import EgoGNN, EgoGraphSAGE, EgoGAT
from graph_learn_tpu.ops.aggregate import gather_group_agg


@pytest.fixture
def sorted_on():
    old = (conf.sorted_gather, conf.sorted_gather_min_bytes)
    conf.sorted_gather, conf.sorted_gather_min_bytes = True, 0
    yield
    conf.sorted_gather, conf.sorted_gather_min_bytes = old


def _table(n=500, d=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((n, d), np.float32))


@pytest.mark.parametrize("op", ["mean", "sum", "max"])
def test_gather_group_agg_matches_reshape_reduce(sorted_on, op):
    table = _table()
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, 500, (32, 5, 7)))
    got = gather_group_agg(table, idx, op=op)
    rows = table[idx.reshape(-1)].reshape(32 * 5, 7, 16)
    want = {"mean": rows.mean(1), "sum": rows.sum(1),
            "max": rows.max(1)}[op]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_gather_group_agg_small_table_takes_plain_path():
    # below the size floor the plain gather runs; results identical
    old = conf.sorted_gather_min_bytes
    conf.sorted_gather_min_bytes = 1 << 40
    try:
        table = _table()
        idx = jnp.asarray(
            np.random.default_rng(2).integers(0, 500, (8, 4)))
        got = gather_group_agg(table, idx, op="mean")
        want = table[idx].mean(1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
    finally:
        conf.sorted_gather_min_bytes = old


def _ego_pair(d=8, b=6, k1=3, k2=4, seed=3):
    """(plain ego, deferred ego, decoder) for a 2-hop float-attr batch."""
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((200, d), np.float32))

    def nodes(shape):
        ids = jnp.asarray(rng.integers(0, 200, shape).astype(np.int32))
        return Nodes(ids=ids, float_attrs=table[ids], type_name="item")

    src = nodes((b,))
    h1 = nodes((b, k1))
    h2 = nodes((b, k1, k2))
    dec = Decoder(attr_types=["float"] * d)
    plain = EgoGraph(src=src, hops=[h1, h2], nbr_nums=(k1, k2))
    deferred = EgoGraph(
        src=src,
        hops=[h1, h2.replace(float_attrs=DeferredRows(table=table,
                                                      idx=h2.ids))],
        nbr_nums=(k1, k2))
    return plain, deferred, dec


@pytest.mark.parametrize("agg", ["gcn", "mean", "sum", "max"])
def test_ego_sage_deferred_matches_plain(sorted_on, agg):
    plain, deferred, dec = _ego_pair()
    model = EgoGraphSAGE([8, 16, 4], dec, agg_type=agg)
    params = model.init(jax.random.key(0), plain, training=False)
    out_plain = model.apply(params, plain, training=False)
    out_def = model.apply(params, deferred, training=False)
    np.testing.assert_allclose(np.asarray(out_def), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_params_init_identical_under_deferral(sorted_on):
    plain, deferred, dec = _ego_pair()
    model = EgoGraphSAGE([8, 16, 4], dec, agg_type="gcn")
    p1 = model.init(jax.random.key(0), plain, training=False)
    p2 = model.init(jax.random.key(0), deferred, training=False)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gat_falls_back_to_materialise(sorted_on):
    # attention needs per-neighbor rows: DeferredRows must materialise
    # and produce the exact plain result
    plain, deferred, dec = _ego_pair()
    model = EgoGAT([8, 16, 4], dec, num_heads=[2, 2])
    params = model.init(jax.random.key(0), plain, training=False)
    out_plain = model.apply(params, plain, training=False)
    out_def = model.apply(params, deferred, training=False)
    np.testing.assert_allclose(np.asarray(out_def), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)


def test_from_query_result_defers_last_hop(sorted_on):
    plain, _, dec = _ego_pair()
    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((200, 8), np.float32))
    result = {"s": plain.src, "h1": plain.hops[0], "h2": plain.hops[1]}
    ego = EgoGraph.from_query_result(result, "s", ["h1", "h2"],
                                     defer_last_table=table)
    assert isinstance(ego.hops[-1].float_attrs, DeferredRows)
    assert ego.hops[0].float_attrs is plain.hops[0].float_attrs
    np.testing.assert_allclose(
        np.asarray(ego.hops[-1].float_attrs.materialize()),
        np.asarray(table[plain.hops[1].ids]))


@pytest.mark.parametrize("agg", ["gcn", "mean", "sum", "max"])
def test_preaggregated_matches_plain(agg):
    # grouped-prefetch path (bench.py / trainers): deepest-hop rows are
    # gathered + group-reduced OUTSIDE the train scan; EgoGNN must consume
    # the PreAggregatedRows carrier identically to the materialised path
    from graph_learn_tpu.nn.data import PreAggregatedRows

    plain, _, dec = _ego_pair()
    model = EgoGraphSAGE([8, 16, 4], dec, agg_type=agg)
    params = model.init(jax.random.key(0), plain, training=False)
    out_plain = model.apply(params, plain, training=False)

    h2 = plain.hops[1]
    op = model.layers[0].convs[-1].deferred_op
    raw = h2.float_attrs.reshape(-1, h2.ids.shape[-1], 8)
    agg_raw = {"mean": raw.mean(1), "sum": raw.sum(1),
               "max": raw.max(1)}[op]
    pre = plain.replace(hops=[
        plain.hops[0],
        h2.replace(float_attrs=PreAggregatedRows(agg_raw, op))])
    out_pre = model.apply(params, pre, training=False)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_preaggregated_op_mismatch_raises():
    from graph_learn_tpu.errors import InvalidArgumentError
    from graph_learn_tpu.nn.data import PreAggregatedRows

    plain, _, dec = _ego_pair()
    model = EgoGraphSAGE([8, 16, 4], dec, agg_type="max")
    params = model.init(jax.random.key(0), plain, training=False)
    h2 = plain.hops[1]
    pre = plain.replace(hops=[
        plain.hops[0],
        h2.replace(float_attrs=PreAggregatedRows(
            h2.float_attrs.reshape(-1, h2.ids.shape[-1], 8).mean(1),
            "mean"))])
    with pytest.raises(InvalidArgumentError):
        model.apply(params, pre, training=False)


def test_preaggregated_rejects_attention():
    # GAT needs per-neighbor rows; a pre-reduced carrier cannot feed it
    from graph_learn_tpu.errors import InvalidArgumentError
    from graph_learn_tpu.nn.data import PreAggregatedRows

    plain, _, dec = _ego_pair()
    model = EgoGAT([8, 16, 4], dec, num_heads=[2, 2])
    params = model.init(jax.random.key(0), plain, training=False)
    h2 = plain.hops[1]
    pre = plain.replace(hops=[
        plain.hops[0],
        h2.replace(float_attrs=PreAggregatedRows(
            h2.float_attrs.reshape(-1, h2.ids.shape[-1], 8).mean(1),
            "mean"))])
    with pytest.raises(InvalidArgumentError):
        model.apply(params, pre, training=False)


def test_deferred_under_jit_and_grad(sorted_on):
    # the fused-train-step usage: deferral inside jit with value_and_grad
    plain, deferred, dec = _ego_pair()
    model = EgoGraphSAGE([8, 16, 4], dec, agg_type="gcn")
    params = model.init(jax.random.key(0), plain, training=False)

    def loss(p, ego):
        return jnp.sum(model.apply(p, ego, training=False) ** 2)

    l1, g1 = jax.jit(jax.value_and_grad(loss))(params, plain)
    l2, g2 = jax.jit(jax.value_and_grad(loss))(params, deferred)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


# --- EgoRGCN deferred deepest level (r5) ---------------------------------

def _rgcn_pair(d=8, b=6, k1=3, k2=4, R=2, seed=5, pre=False):
    """(plain ego, deferred ego, decoder) for a 2-relation 2-hop batch.

    Hop layout per EgoRGCN: [r0_h1, r1_h1, r0r0_h2, r0r1_h2, r1r0_h2,
    r1r1_h2]; the deepest R^2 hops carry DeferredRows (or
    PreAggregatedRows when pre=True)."""
    from graph_learn_tpu.nn.data import PreAggregatedRows

    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((200, d), np.float32))

    def nodes(shape):
        ids = jnp.asarray(rng.integers(0, 200, shape).astype(np.int32))
        return Nodes(ids=ids, float_attrs=table[ids], type_name="item")

    src = nodes((b,))
    lvl1 = [nodes((b, k1)) for _ in range(R)]
    lvl2 = [nodes((b, k1, k2)) for _ in range(R * R)]
    dec = Decoder(attr_types=["float"] * d)
    plain = EgoGraph(src=src, hops=lvl1 + lvl2, nbr_nums=(k1, k2))

    def defer(v):
        if pre:
            agg = gather_group_agg(table, v.ids, op="mean")
            return v.replace(float_attrs=PreAggregatedRows(agg, "mean"))
        return v.replace(float_attrs=DeferredRows(table=table, idx=v.ids))

    deferred = EgoGraph(src=src, hops=lvl1 + [defer(v) for v in lvl2],
                        nbr_nums=(k1, k2))
    return plain, deferred, dec


@pytest.mark.parametrize("pre", [False, True])
@pytest.mark.parametrize("mode", ["plain", "bases", "blocks"])
def test_ego_rgcn_deferred_matches_plain(sorted_on, mode, pre):
    """The deferred deepest level (per-relation pre-reduced neighbors)
    is exact vs the materialised path for every decomposition."""
    from graph_learn_tpu.nn.models.ego_gnn import EgoRGCN

    plain, deferred, dec = _rgcn_pair(pre=pre)
    kw = {"bases": {"num_bases": 2}, "blocks": {"num_blocks": 2},
          "plain": {}}[mode]
    model = EgoRGCN(dims=[8, 16, 4], decoder=dec, num_relations=2, **kw)
    params = model.init(jax.random.key(0), plain, training=False)
    out_plain = model.apply(params, plain, training=False)
    out_def = model.apply(params, deferred, training=False)
    np.testing.assert_allclose(np.asarray(out_def), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)
    # grads through the deferred path match too
    gp = jax.grad(lambda p: model.apply(p, plain).sum())(params)
    gd = jax.grad(lambda p: model.apply(p, deferred).sum())(params)
    jax.tree.map(lambda a, c: np.testing.assert_allclose(
        np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4), gp, gd)


def test_ego_rgcn_preaggregated_op_mismatch_raises(sorted_on):
    import graph_learn_tpu as gl
    from graph_learn_tpu.nn.models.ego_gnn import EgoRGCN

    plain, deferred, dec = _rgcn_pair(pre=True)
    model = EgoRGCN(dims=[8, 16, 4], decoder=dec, num_relations=2,
                    agg_type="sum")  # pre-agg is mean
    params = model.init(jax.random.key(0), plain, training=False)
    with pytest.raises(gl.InvalidArgumentError):
        model.apply(params, deferred, training=False)
