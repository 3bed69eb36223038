"""serve_main entrypoint: config JSON -> graph -> HTTP serving (+updates).

The deployable unit deploy/k8s/serving.yaml runs (DGS parity:
src/service/apps/service_main.cpp + helm chart wiring).
"""

import json
import time
import urllib.request

import numpy as np
import pytest

import graph_learn_tpu as gl
from graph_learn_tpu.gsl.plan import query_to_plan
from graph_learn_tpu.online.http import ServingClient
from graph_learn_tpu.online.serve_main import graph_from_config, serve
from graph_learn_tpu.online.stream import FileTopic, StreamProducer


@pytest.fixture
def cfg(tmp_graph_dir, tmp_path):
    FileTopic(str(tmp_path / "topic"), num_partitions=2)
    return {
        "host": "127.0.0.1",
        "port": 0,
        "nodes": [{"source": tmp_graph_dir["node"], "type": "item",
                   "decoder": {"weighted": True, "labeled": True,
                               "attr_types": ["float"] * 4}}],
        "edges": [{"source": tmp_graph_dir["edge"],
                   "type": ["item", "item", "rel"],
                   "decoder": {"weighted": True}}],
        "update_topic": {"root": str(tmp_path / "topic"),
                         "poll_interval_s": 0.2},
    }


def test_graph_from_config(cfg):
    g = graph_from_config(cfg)
    stats = g.get_stats()
    assert stats["nodes"]["item"] == 40
    assert stats["edges"]["rel"] > 0


def test_graph_from_config_bucketed_attr_tuples(tmp_graph_dir):
    # JSON can't carry tuples; list entries must coerce
    from graph_learn_tpu.online.serve_main import _decoder
    d = _decoder({"attr_types": ["float", ["int", 100]],
                  "attr_dims": [None, 8]})
    assert d.int_attrs and d.int_attrs[0].bucket_size == 100


def test_serve_end_to_end_with_update_pump(cfg, tmp_path):
    server, stop = serve(cfg, block=False)
    try:
        base = "http://%s:%d" % (server.host, server.port)
        # healthz probe (k8s readiness)
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True

        client = ServingClient(base)
        g = server.graph
        q = (g.V("item").batch(4).alias("src")
             .outV("rel").sample(3).by("topk").alias("h1").values())
        qid = client.install(query_to_plan(q), micro_batch=4)
        out = client.run(qid, [0, 10, 20, 30])
        assert np.asarray(out["h1"]["ids"]).shape == (4, 3)

        # stream an update through the topic; the pump applies it
        deg0 = int(np.asarray(
            client.run(qid, [0])["src"]["degrees"])[0]) \
            if "degrees" in client.run(qid, [0])["src"] else None
        prod = StreamProducer(FileTopic(str(tmp_path / "topic"),
                                        create=False))
        prod.put_edges("rel", [0, 0, 0], [390, 380, 370],
                       weights=[9.0, 8.0, 7.0])
        deadline = time.time() + 10
        while time.time() < deadline:
            if int(server.graph.out_degrees(
                    np.array([0]), "rel")[0]) >= 4:
                break
            time.sleep(0.1)
        assert int(server.graph.out_degrees(np.array([0]), "rel")[0]) == 4
        out2 = client.run(qid, [0, 10, 20, 30])  # still serves post-update
        assert np.asarray(out2["h1"]["ids"]).shape == (4, 3)
        assert deg0 is None or deg0 >= 0
    finally:
        stop()


def test_serve_main_models_config(cfg, tmp_graph_dir, tmp_path):
    """A "models" config entry serves an exported artifact at /predict
    straight from worker boot (the deployable predict surface)."""
    import json as _json
    import urllib.request

    import jax
    import jax.numpy as jnp
    from graph_learn_tpu.gsl.compile import _execute
    from graph_learn_tpu.online.export import export_serving_fn

    g0 = graph_from_config(cfg)
    q = (g0.V("item").batch(2).alias("src")
         .outV("rel").sample(2).by("topk").alias("h1").values())
    tables = q.device_tables()

    def serve_fn(seeds, key):
        out = _execute(q, tables, seeds, key)
        return jnp.mean(out["h1"].float_attrs, axis=1)

    path = str(tmp_path / "m.stablehlo")
    export_serving_fn(serve_fn, (jnp.arange(2, dtype=jnp.int32),
                                 jax.random.key(0)), path=path)
    cfg2 = dict(cfg, models=[{"name": "m", "artifact": path}])
    cfg2.pop("update_topic")
    server, stop = serve(cfg2, block=False)
    try:
        base = "http://%s:%d" % (server.host, server.port)
        req = urllib.request.Request(
            base + "/predict",
            data=_json.dumps({"model": "m", "ids": [1]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            out = _json.loads(r.read())["outputs"]
        assert np.asarray(out).shape == (1, 4)
    finally:
        stop()
