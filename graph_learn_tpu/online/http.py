"""HTTP serving front-end + client for the online tier.

TPU-native equivalent of the DGS service edge
(reference: dynamic_graph_service/ — seastar HTTP EventHandler routes
``GET /serving/w<id>?qid&vid`` (src/service/event_handler.cc:139-151),
coordinator admin HTTP ``POST /admin/init|/admin/query``,
``GET /admin/schema`` (python/coordinator/http_service.py:35-118), and the
Java GSL client's HTTP transport (gsl_client/.../http/HttpClient.java)).

Redesign: one process, stdlib ThreadingHTTPServer in front of
QueryService — requests are micro-batched onto the jitted device plan, so
the HTTP layer only parses/serializes JSON.  Routes:

- ``POST /admin/query``      body = plan JSON (gsl/plan.py) -> {"qid": n}
- ``GET  /admin/schema``     node/edge types + counts
- ``GET  /admin/query/stats?qid=N``  latency/QPS stats
- ``POST /serving``          {"qid": n, "ids": [...]} -> {alias: payload}
- ``POST /admin/update``     {"edges": {type: {src_ids, dst_ids, ...}},
                              "nodes": {type: {ids, ...}}} staged + applied
- ``POST /admin/refresh``    re-upload tables so updates become visible
- ``GET  /healthz``          k8s readiness/liveness probe (deploy/k8s/)

``online/serve_main.py`` is the deployable entrypoint that builds the
graph from a config JSON and runs this server (the DGS
service_main.cpp role).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib import request as _urlreq
from urllib.parse import parse_qs, urlparse

import numpy as np

from graph_learn_tpu.gsl.plan import plan_to_query, query_to_plan  # noqa: F401
from graph_learn_tpu.online.serving import QueryService
from graph_learn_tpu.online.update import UpdateBuffer, apply_updates


def _to_jsonable(x):
    if hasattr(x, "__array__"):
        a = np.asarray(x)
        if a.dtype.kind == "f":
            a = a.astype(np.float64)
        return a.tolist()
    return x


def _value_payload(v) -> dict:
    out = {}
    for f in ("ids", "raw_ids", "degrees", "weights", "labels",
              "timestamps", "int_attrs", "float_attrs", "edge_ids"):
        a = getattr(v, f, None)
        if a is not None:
            out[f] = _to_jsonable(a)
    for sub in ("src_nodes", "dst_nodes"):
        n = getattr(v, sub, None)
        if n is not None:
            out[sub] = _value_payload(n)
    return out


class ServingServer:
    """HTTP front-end over a graph: install plans, serve, ingest updates."""

    def __init__(self, graph, host: str = "127.0.0.1", port: int = 0,
                 graph_shards: int = 1):
        self.graph = graph
        self.service = QueryService(graph, graph_shards=graph_shards)
        self._buf = UpdateBuffer()
        # admin mutations take the global lock; /serving takes no lock at
        # all — each installed query coalesces concurrent callers onto
        # shared device launches and serves them against copy-on-write
        # snapshots, so updates/refresh never stall reads
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def do_GET(self):
                try:
                    u = urlparse(self.path)
                    if u.path == "/healthz":
                        # k8s readiness/liveness probe (deploy/k8s): 200
                        # once the graph is initialised and serving
                        self._send(200, {"ok": True,
                                         "queries": len(
                                             outer.service._queries)})
                    elif u.path == "/admin/schema":
                        self._send(200, outer.graph.get_stats())
                    elif u.path == "/admin/query/stats":
                        qid = int(parse_qs(u.query)["qid"][0])
                        self._send(200, outer.service.stats(qid))
                    else:
                        self._send(404, {"error": "unknown route"})
                except Exception as e:  # surface errors to the client
                    self._send(500, {"error": str(e)})

            def do_POST(self):
                try:
                    u = urlparse(self.path)
                    body = self._body()
                    if u.path == "/admin/query":
                        q = plan_to_query(outer.graph, body)
                        mb = int(body.get("micro_batch", 256))
                        with outer._lock:
                            qid = outer.service.install(q, micro_batch=mb)
                        self._send(200, {"qid": qid})
                    elif u.path == "/serving":
                        ids = np.asarray(body["ids"], np.int64)
                        qid = int(body["qid"])
                        if qid not in outer.service._queries:
                            raise KeyError("unknown qid %r" % qid)
                        out = outer.service.run(qid, ids)
                        self._send(200, {a: _value_payload(v)
                                         for a, v in out.items()})
                    elif u.path == "/admin/update":
                        with outer._lock:
                            for t, kw in body.get("nodes", {}).items():
                                outer._buf.add_nodes(t, **{
                                    k: np.asarray(v) for k, v in kw.items()})
                            for t, kw in body.get("edges", {}).items():
                                outer._buf.add_edges(t, **{
                                    k: np.asarray(v) for k, v in kw.items()})
                            apply_updates(outer.graph, outer._buf)
                            outer._buf.clear()
                        self._send(200, {"ok": True})
                    elif u.path == "/admin/expire":
                        from graph_learn_tpu.online.update import \
                            expire_edges
                        with outer._lock:
                            dropped = expire_edges(
                                outer.graph, body["older_than"],
                                body.get("edge_types"))
                        self._send(200, {"dropped": dropped})
                    elif u.path == "/admin/refresh":
                        with outer._lock:
                            outer.service.refresh()
                        self._send(200, {"ok": True})
                    elif u.path == "/admin/model":
                        # install an exported sample+forward artifact
                        # (online/export.py StableHLO) by server-local
                        # path or inline base64 bytes
                        import base64
                        art = (base64.b64decode(body["artifact_b64"])
                               if "artifact_b64" in body
                               else body["artifact"])
                        with outer._lock:
                            m = outer.service.install_model(body["name"],
                                                            art)
                        self._send(200, {"name": m.name,
                                         "batch": m.batch})
                    elif u.path == "/predict":
                        out = outer.service.predict(
                            body["model"], body["ids"],
                            seed=int(body.get("seed", 0)))
                        import jax as _jax
                        self._send(200, {"outputs": _jax.tree.map(
                            lambda x: np.asarray(x).tolist(), out)})
                    else:
                        self._send(404, {"error": "unknown route"})
                except Exception as e:
                    self._send(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.service.close()


class ServingClient:
    """Remote GSL client (parity with the Java GSL client's transport:
    build fluent query -> plan JSON -> install -> run by ids)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path: str, payload: dict) -> dict:
        req = _urlreq.Request(
            self.base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with _urlreq.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _get(self, path: str) -> dict:
        with _urlreq.urlopen(self.base + path, timeout=self.timeout) as r:
            return json.loads(r.read())

    def schema(self) -> dict:
        return self._get("/admin/schema")

    def install(self, query_or_plan, micro_batch: int = 256) -> int:
        plan = (query_or_plan if isinstance(query_or_plan, dict)
                else query_to_plan(query_or_plan))
        plan = dict(plan, micro_batch=micro_batch)
        return int(self._post("/admin/query", plan)["qid"])

    def run(self, qid: int, ids) -> dict:
        return self._post("/serving", {
            "qid": qid, "ids": np.asarray(ids).tolist()})

    def install_model(self, name: str, artifact) -> dict:
        """artifact: server-local path (str) or exported bytes."""
        if isinstance(artifact, (bytes, bytearray)):
            import base64
            return self._post("/admin/model", {
                "name": name,
                "artifact_b64": base64.b64encode(bytes(artifact)).decode()})
        return self._post("/admin/model", {"name": name,
                                           "artifact": artifact})

    def predict(self, model: str, ids, seed: int = 0):
        return self._post("/predict", {
            "model": model, "ids": np.asarray(ids).tolist(),
            "seed": int(seed)})["outputs"]

    def update(self, nodes: Optional[dict] = None,
               edges: Optional[dict] = None) -> dict:
        return self._post("/admin/update", {
            "nodes": nodes or {}, "edges": edges or {}})

    def expire(self, older_than, edge_types=None) -> dict:
        return self._post("/admin/expire", {
            "older_than": int(older_than), "edge_types": edge_types})

    def refresh(self):
        return self._post("/admin/refresh", {})

    def stats(self, qid: int) -> dict:
        return self._get("/admin/query/stats?qid=%d" % qid)
