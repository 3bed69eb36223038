"""C++ GSL client conformance: the JSON plan protocol is language-neutral.

Parity with the reference's second-language client
(reference: dynamic_graph_service/gsl_client/.../Traversal.java:28-167 —
a Java fluent GSL that builds a JSON plan, installs it over coordinator
HTTP, and runs queries against serving workers).  Here the client is C++
(clients/cpp/gsl_client.hpp) speaking gsl/plan.py's JSON plan over
online/http.py.
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

import graph_learn_tpu as gl

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CPP_DIR = os.path.join(_ROOT, "clients", "cpp")
_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "plan_2hop.json")

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


@pytest.fixture(scope="module")
def client_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cppclient") / "gsl_client")
    subprocess.run(
        ["g++", "-std=c++17", "-O2", "-o", out,
         os.path.join(_CPP_DIR, "conformance_main.cc")],
        check=True, capture_output=True, text=True)
    return out


@pytest.fixture
def g(tmp_graph_dir):
    g = gl.Graph()
    g.node(tmp_graph_dir["node"], node_type="item",
           decoder=gl.Decoder(weighted=True, labeled=True,
                              attr_types=["float"] * 4))
    g.edge(tmp_graph_dir["edge"], edge_type=("item", "item", "rel"),
           decoder=gl.Decoder(weighted=True))
    return g.init()


def _python_plan(g):
    from graph_learn_tpu.gsl.plan import query_to_plan
    q = (g.V("item").batch(4).alias("src")
         .outV("rel").sample(3).by("topk").alias("h1")
         .outV("rel").sample(2).by("topk").alias("h2").values())
    return query_to_plan(q)


def test_plan_conformance(client_bin, g):
    """C++ emitted plan == committed fixture == Python query_to_plan."""
    out = subprocess.run([client_bin, "plan"], check=True,
                         capture_output=True, text=True)
    cpp_plan = json.loads(out.stdout)
    py_plan = _python_plan(g)
    assert cpp_plan == py_plan
    fixture = json.load(open(_FIXTURE))
    assert cpp_plan == fixture


def test_cpp_client_end_to_end(client_bin, g):
    """C++ client installs + runs a 2-hop query over live HTTP and gets
    byte-identical results to the Python client (deterministic topk)."""
    from graph_learn_tpu.online.http import ServingClient, ServingServer
    srv = ServingServer(g).start()
    try:
        ids = [0, 10, 20, 30, 40]
        out = subprocess.run(
            [client_bin, "drive", srv.host, str(srv.port), "item", "rel"]
            + [str(i) for i in ids],
            check=True, capture_output=True, text=True, timeout=120)
        cpp = json.loads(out.stdout)
        assert "installed qid=" in out.stderr
        assert "qps" in out.stderr  # stats round-trip worked

        c = ServingClient("http://%s:%d" % (srv.host, srv.port))
        q = (g.V("item").batch(4).alias("src")
             .outV("rel").sample(3).by("topk").alias("h1")
             .outV("rel").sample(2).by("topk").alias("h2").values())
        qid = c.install(q, micro_batch=16)
        py = c.run(qid, ids)

        assert cpp["src"]["ids"] == py["src"]["ids"]
        assert cpp["h1"]["ids"] == py["h1"]["ids"]
        assert cpp["h2"]["ids"] == py["h2"]["ids"]
        np.testing.assert_allclose(cpp["src"]["float_attrs"],
                                   py["src"]["float_attrs"], rtol=1e-6)

        # mutation surface: update + refresh through the C++-exercised
        # routes (update/refresh go through the same handlers)
        r = c.update(edges={"rel": {"src_ids": [0], "dst_ids": [390],
                                    "weights": [99.0]}})
        assert r["ok"]
        c.refresh()
        out2 = c.run(qid, [0])
        assert 39 in out2["h1"]["ids"][0]  # heavy new edge tops topk
    finally:
        srv.stop()
