"""Multi-process serving fleet: serve_main worker PROCESSES behind one
ServingRouter over real HTTP.

This runs deploy/k8s/serving.yaml's replicated topology for real — N
deployable workers (`python -m graph_learn_tpu.online.serve_main`), a
router hash-routing queries by vid and stitching replies, update fan-out
reaching every replica, and aggregated stats — the DGS analogue being
the helm chart's serving workers behind the coordinator/front tier
(reference: dynamic_graph_service/k8s/charts/dgs/,
src/service/apps/service_main.cpp, common/partitioner.h vid hashing).
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from graph_learn_tpu.online.http import ServingClient
from graph_learn_tpu.online.router import ServingRouter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_WORKERS = 3


def _free_ports(n):
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def _wait_healthy(url, deadline):
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
                if r.status == 200:
                    return True
        except (urllib.error.URLError, ConnectionError, OSError):
            time.sleep(0.5)
    return False


@pytest.fixture
def fleet(tmp_graph_dir, tmp_path):
    cfg = {
        "host": "127.0.0.1",
        "nodes": [{"source": str(tmp_graph_dir["node"]), "type": "item",
                   "decoder": {"weighted": True, "labeled": True,
                               "attr_types": ["float"] * 4}}],
        "edges": [{"source": str(tmp_graph_dir["edge"]),
                   "type": ["item", "item", "rel"],
                   "decoder": {"weighted": True}}],
    }
    cfg_path = str(tmp_path / "serve.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON"))}
    env.pop("JAX_PLATFORMS", None)
    env["GLT_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    ports = _free_ports(N_WORKERS)
    procs = [subprocess.Popen(
        [sys.executable, "-m", "graph_learn_tpu.online.serve_main",
         "--config", cfg_path, "--port", str(p)],
        env=env, cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for p in ports]
    urls = ["http://127.0.0.1:%d" % p for p in ports]
    try:
        deadline = time.time() + 240
        for u, pr in zip(urls, procs):
            if not _wait_healthy(u, deadline):
                pr.poll()
                raise RuntimeError(
                    "worker %s not healthy; rc=%r stderr:\n%s"
                    % (u, pr.returncode,
                       pr.stderr.read()[-2000:] if pr.poll() is not None
                       else "<still running>"))
        yield cfg, urls
    finally:
        for pr in procs:
            pr.terminate()
        for pr in procs:
            try:
                pr.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pr.kill()


def _local_query(cfg):
    from graph_learn_tpu.online.serve_main import graph_from_config
    g = graph_from_config(cfg)
    return g, (g.V("item").batch(4).alias("src")
               .outV("rel").sample(3).by("topk").alias("h1").values())


def test_router_over_worker_processes(fleet):
    cfg, urls = fleet
    g, q = _local_query(cfg)
    router = ServingRouter(urls)
    qid = router.install(q, micro_batch=4)

    # raw vids spreading over all 3 owners under vid % N
    ids = [0, 10, 20, 30, 50, 110, 170, 230]
    owners = {int(v) % N_WORKERS for v in ids}
    assert owners == set(range(N_WORKERS))
    out = router.run(qid, ids)

    # oracle: ONE worker (replicated graph, deterministic topk) answers
    # the whole batch; the stitched fleet answer must match exactly
    oracle_client = ServingClient(urls[0])
    oracle_qid = oracle_client.install(q, micro_batch=4)
    want = oracle_client.run(oracle_qid, ids)

    def eq(a, b, path=""):
        assert type(a) is type(b), (path, type(a), type(b))
        if isinstance(a, dict):
            assert a.keys() == b.keys(), (path, a.keys(), b.keys())
            for k in a:
                eq(a[k], b[k], path + "/" + str(k))
        elif isinstance(a, list):
            assert a == b, (path, a[:4], b[:4])
        else:
            assert a == b, (path, a, b)

    eq(out, want)

    # stats aggregate across the fleet
    st = router.stats(qid)
    assert st["workers"] == N_WORKERS
    assert st["qps"] > 0


def test_update_fans_out_to_every_replica(fleet):
    cfg, urls = fleet
    g, q = _local_query(cfg)
    router = ServingRouter(urls)
    qid = router.install(q, micro_batch=4)
    base = router.run(qid, [0])

    # a new heaviest edge from vid 0: topk's first neighbor must flip on
    # EVERY replica (the router fans updates out; refresh snapshots)
    router.update(edges={"rel": {"src_ids": [0], "dst_ids": [230],
                                 "weights": [99.0]}})
    router.refresh()
    # serving payloads carry DENSE indices; resolve raw 230 locally
    want = int(g.store.node_table("item").index.lookup(
        np.array([230]))[0])
    out = router.run(qid, [0])
    assert out["h1"]["ids"][0][0] == want, out["h1"]["ids"]
    assert out != base
    # ...including replicas the routed query never touched: ask each
    # worker directly with its own install
    for u in urls:
        c = ServingClient(u)
        w_qid = c.install(q, micro_batch=4)
        w_out = c.run(w_qid, [0])
        assert w_out["h1"]["ids"][0][0] == want, (u, w_out["h1"]["ids"])


def test_checkpoint_barrier_quiesces_fleet(fleet):
    cfg, urls = fleet
    router = ServingRouter(urls)
    mark = router.checkpoint(logs=[None] * N_WORKERS)
    assert mark["log_offsets"] == [0] * N_WORKERS
    # updates proceed again after the barrier exits
    r = router.update(edges={"rel": {"src_ids": [10], "dst_ids": [20],
                                     "weights": [1.0]}})
    assert r["applied"]
