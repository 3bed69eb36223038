"""Standalone Python GSL client conformance (clients/py/gsl_client.py).

A third consumer of the JSON plan protocol, importable WITHOUT the
framework — the deployable-client role the reference's Java gsl_client
plays (Traversal.java:28-167), including its plan-fusion optimizer
(parser/optimizer/FusionRule.java).
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import graph_learn_tpu as gl

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "plan_2hop.json")


def _load_standalone():
    """Import clients/py/gsl_client.py WITHOUT the package on sys.path —
    proves it has no framework (or jax) dependency."""
    spec = importlib.util.spec_from_file_location(
        "standalone_gsl_client",
        os.path.join(_ROOT, "clients", "py", "gsl_client.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def client_mod():
    return _load_standalone()


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


def test_standalone_imports_without_framework(client_mod):
    """The module loaded with no graph_learn_tpu/jax import of its own."""
    src = open(os.path.join(_ROOT, "clients", "py", "gsl_client.py")).read()
    assert "import graph_learn_tpu" not in src
    assert "import jax" not in src


def test_plan_conformance(client_mod, g):
    """Standalone plan == committed fixture == Python query_to_plan ==
    (transitively) the C++ client's plan."""
    cg = client_mod.Graph("127.0.0.1", 0)
    q = (cg.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("h1")
         .outV("rel").sample(2).by("topk").alias("h2"))
    plan = q.plan()

    from graph_learn_tpu.gsl.plan import query_to_plan
    pyq = (g.V("item").batch(4).alias("src")
           .outV("rel").sample(3).by("topk").alias("h1")
           .outV("rel").sample(2).by("topk").alias("h2").values())
    assert json.loads(json.dumps(plan)) == query_to_plan(pyq)
    assert json.loads(json.dumps(plan)) == json.load(open(_FIXTURE))


def test_fusion_dedupes_deterministic_siblings(client_mod):
    """Two identical topk branches fuse into one node; children
    re-parent; random-strategy duplicates do NOT fuse
    (FusionRule.java:31-48 analogue, restricted to provably
    deterministic nodes)."""
    cg = client_mod.Graph("127.0.0.1", 0)
    q = cg.V("item").batch(4).alias("src").each(
        lambda v: (v.outV("rel").sample(3).by("topk")
                   .outV("rel").sample(2).by("topk").alias("a")),
        lambda v: (v.outV("rel").sample(3).by("topk")
                   .outV("rel").sample(2).by("topk").alias("b")),
        lambda v: v.outNeg("rel").sample(2).by("random").alias("n1"),
        lambda v: v.outNeg("rel").sample(2).by("random").alias("n2"))
    plan = q.plan()
    fused = client_mod.fuse_plan(plan)
    # the two unaliased topk hop-1 nodes fuse; the aliased hop-2 pair
    # does NOT (different aliases must both survive); randoms don't fuse
    assert len(plan["nodes"]) == 7
    assert len(fused["nodes"]) == 6
    kinds = [(r["kind"], r["strategy"]) for r in fused["nodes"]]
    assert kinds.count(("out_neg", "random")) == 2
    aliases = {r["alias_name"] for r in fused["nodes"]}
    assert {"a", "b", "n1", "n2"} <= aliases
    # dense renumbering + valid parent links
    nids = [r["nid"] for r in fused["nodes"]]
    assert nids == list(range(len(fused["nodes"])))
    for r in fused["nodes"]:
        if r["parent"] is not None:
            assert r["parent"] in nids


def test_standalone_client_end_to_end(client_mod, g):
    """Install + run over live HTTP == the in-package ServingClient,
    and a fused branching query returns identical aliased results to
    the unfused plan (fusion is semantics-preserving)."""
    from graph_learn_tpu.online.http import ServingClient, ServingServer
    srv = ServingServer(g).start()
    try:
        cg = client_mod.Graph(srv.host, srv.port)
        assert "item" in cg.schema()["nodes"]
        q = (cg.V("item").batch(4).alias("src")
             .outV("rel").sample(3).by("topk").alias("h1")
             .outV("rel").sample(2).by("topk").alias("h2"))
        qid = cg.install(q, micro_batch=16)
        ids = [0, 10, 20, 30, 40]
        out = cg.run(qid, ids)

        c = ServingClient("http://%s:%d" % (srv.host, srv.port))
        pyq = (g.V("item").batch(4).alias("src")
               .outV("rel").sample(3).by("topk").alias("h1")
               .outV("rel").sample(2).by("topk").alias("h2").values())
        qid2 = c.install(pyq, micro_batch=16)
        py = c.run(qid2, ids)
        assert out["src"]["ids"] == py["src"]["ids"]
        assert out["h1"]["ids"] == py["h1"]["ids"]
        assert out["h2"]["ids"] == py["h2"]["ids"]
        np.testing.assert_allclose(out["src"]["float_attrs"],
                                   py["src"]["float_attrs"], rtol=1e-6)
        assert "qps" in cg.stats(qid)

        # fused vs unfused branching query: identical aliased results
        bq = cg.V("item").batch(4).alias("s").each(
            lambda v: (v.outV("rel").sample(3).by("topk")
                       .outV("rel").sample(2).by("topk").alias("x")),
            lambda v: (v.outV("rel").sample(3).by("topk").alias("y")))
        qf = cg.install(bq, micro_batch=16, fuse=True)
        qu = cg.install(bq, micro_batch=16, fuse=False)
        rf, ru = cg.run(qf, ids), cg.run(qu, ids)
        assert rf["x"]["ids"] == ru["x"]["ids"]
        assert rf["y"]["ids"] == ru["y"]["ids"]

        # update + refresh round-trip through the standalone surface
        r = cg.update(edges={"rel": {"src_ids": [0], "dst_ids": [390],
                                     "weights": [99.0]}})
        assert r["ok"]
        cg.refresh()
        out2 = cg.run(qid, [0])
        assert 39 in out2["h1"]["ids"][0]
    finally:
        srv.stop()


def test_standalone_client_predict(client_mod, g, tmp_path):
    """The standalone client's install_model/predict (the Java client's
    TF-serving predict role) round-trips an exported artifact."""
    import jax
    import jax.numpy as jnp
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.online.export import export_serving_fn
    from graph_learn_tpu.online.http import ServingServer

    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("hop1").values())
    tables = q.device_tables()

    def serve(seeds, key):
        out = _execute(q, tables, seeds, key)
        return jnp.mean(out["hop1"].float_attrs, axis=1)

    seeds = jnp.arange(4, dtype=jnp.int32)
    blob = export_serving_fn(serve, (seeds, jax.random.key(0)))
    srv = ServingServer(g).start()
    try:
        cg = client_mod.Graph(srv.host, srv.port)
        r = cg.install_model("emb", bytes(blob))
        assert r["batch"] == 4
        got = np.asarray(cg.predict("emb", [2, 7]))
        want = np.asarray(serve(jnp.asarray([2, 7, 2, 2], jnp.int32),
                                jax.random.key(0)))[:2]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()


def test_standalone_client_where_conditional(client_mod, tmp_path):
    """.where() conditional negatives through the standalone client's
    plan protocol: the installed query draws category-matching,
    neighbor-rejected negatives server-side."""
    n = 24
    with open(tmp_path / "n", "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(n):
            f.write("%d\t%d\n" % (i, i % 2))
    with open(tmp_path / "e", "w") as f:
        f.write("src_id:int64\tdst_id:int64\n")
        for i in range(n):
            for j in range(n):
                if j != i and (j - i) % n > 6:
                    f.write("%d\t%d\n" % (i, j))
    gg = (gl.Graph()
          .node(str(tmp_path / "n"), "item",
                gl.Decoder(attr_types=["int"], attr_dims=[4]))
          .edge(str(tmp_path / "e"), ("item", "item", "rel"),
                gl.Decoder())).init()
    from graph_learn_tpu.config import conf
    from graph_learn_tpu.online.http import ServingServer
    old = conf.sampling_retry_times
    conf.sampling_retry_times = 20
    srv = ServingServer(gg).start()
    try:
        cg = client_mod.Graph(srv.host, srv.port)
        # standalone builder has no endpoint nodes; condition on the
        # seed itself (target=src): negatives match the seed's category
        q = (cg.V("item").batch(8).alias("src")
             .outNeg("rel").sample(3).by("random")
             .where("src", {"int_cols": [0], "int_props": [1.0],
                            "unique": True}).alias("neg"))
        qid = cg.install(q, micro_batch=8)
        out = cg.run(qid, list(range(8)))
        neg = np.asarray(out["neg"]["ids"])
        src = np.asarray(out["src"]["ids"])
        cats = np.arange(n) % 2
        nbrs = {}
        et = gg.store.edge_table("rel")
        for s, t in zip(et.src.tolist(), et.dst.tolist()):
            nbrs.setdefault(s, set()).add(t)
        for i in range(len(src)):
            # conditioned on the SEED's own category here (target=src)
            assert (cats[neg[i]] == cats[src[i]]).all()
            assert len(set(neg[i].tolist())) == 3  # unique
            for v in neg[i]:
                assert v not in nbrs[src[i]] and v != src[i]
    finally:
        srv.stop()
        conf.sampling_retry_times = old
