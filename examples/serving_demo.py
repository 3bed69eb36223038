"""Serving-worker demo: the exact flow deploy/k8s/serving.yaml runs.

Generates a small graph, writes a serve_main config JSON (the shape the
k8s ConfigMap mounts), starts the worker in-process, drives it like an
external client: healthz probe, remote query install, serving runs, a
streaming update through the FileTopic, and a post-update query.

Reference flow being mirrored: DGS service_main + helm chart
(dynamic_graph_service/k8s/charts/dgs/) with the Java client's
install->run loop (gsl_client/.../Graph.java).
"""

import json
import os
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import graph_learn_tpu as gl  # noqa: E402
from graph_learn_tpu.gsl.plan import query_to_plan  # noqa: E402
from graph_learn_tpu.online.http import ServingClient  # noqa: E402
from graph_learn_tpu.online.serve_main import serve  # noqa: E402
from graph_learn_tpu.online.stream import (FileTopic,  # noqa: E402
                                           StreamProducer)


def write_graph(d: str, n: int = 200):
    rng = np.random.default_rng(0)
    node, edge = os.path.join(d, "node_table"), os.path.join(d, "edge_table")
    with open(node, "w") as f:
        f.write("id:int64\tlabel:int64\tfeature:string\n")
        for i in range(n):
            f.write("%d\t%d\t%s\n" % (i, i % 5, ":".join(
                "%.4f" % x for x in rng.random(4))))
    with open(edge, "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(n):
            for j in range(1 + i % 4):
                f.write("%d\t%d\t%.2f\n"
                        % (i, (i * 7 + j * 13) % n, 0.5 + j))
    return node, edge


def main():
    d = tempfile.mkdtemp(prefix="glt_serving_demo_")
    node, edge = write_graph(d)
    topic_root = os.path.join(d, "topic")
    FileTopic(topic_root, num_partitions=2)
    cfg = {
        "host": "127.0.0.1", "port": 0,
        "nodes": [{"source": node, "type": "item",
                   "decoder": {"labeled": True,
                               "attr_types": ["float"] * 4}}],
        "edges": [{"source": edge, "type": ["item", "item", "rel"],
                   "decoder": {"weighted": True}}],
        "update_topic": {"root": topic_root, "poll_interval_s": 0.5},
    }
    cfg_path = os.path.join(d, "serving.json")
    json.dump(cfg, open(cfg_path, "w"), indent=2)
    print("config (the k8s ConfigMap payload): %s" % cfg_path)

    server, stop = serve(cfg, block=False)
    base = "http://%s:%d" % (server.host, server.port)
    print("worker up at %s" % base)
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        print("healthz:", json.loads(r.read()))

    client = ServingClient(base, timeout=300.0)  # first run pays compile
    q = (server.graph.V("item").batch(8).alias("src")
         .outV("rel").sample(4).by("edge_weight").alias("h1")
         .outV("rel").sample(3).by("random").alias("h2").values())
    qid = client.install(query_to_plan(q), micro_batch=8)
    t0 = time.perf_counter()
    out = client.run(qid, list(range(8)))
    print("install+run qid=%d: h2 ids %s (%.1f ms)" % (
        qid, np.asarray(out["h2"]["ids"]).shape,
        1e3 * (time.perf_counter() - t0)))

    # stream an update like a dataloader pod would
    StreamProducer(FileTopic(topic_root, create=False)).put_edges(
        "rel", [0] * 3, [50, 60, 70], weights=[9.0, 9.0, 9.0])
    deadline = time.time() + 15
    while time.time() < deadline:
        if int(server.graph.out_degrees(np.array([0]), "rel")[0]) >= 4:
            break
        time.sleep(0.2)
    print("deg(0) after streamed update:",
          int(server.graph.out_degrees(np.array([0]), "rel")[0]))
    out2 = client.run(qid, [0])
    print("post-update serve ok:", np.asarray(out2["h1"]["ids"]).shape)
    stop()
    print("done")


if __name__ == "__main__":
    main()
