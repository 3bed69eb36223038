"""Standalone GSL serving client — pure Python stdlib, no framework import.

Third consumer of graph_learn_tpu's JSON query-plan wire format
(graph_learn_tpu/gsl/plan.py), alongside the in-package Python client and
the C++ client (clients/cpp/gsl_client.hpp).  Role parity with the
reference's Java GSL client (reference: dynamic_graph_service/gsl_client/
src/main/java/org/aliyun/gsl_client/Traversal.java:28-167 fluent builder,
parser/Plan.java JSON plan, parser/optimizer/FusionRule.java plan fusion,
http/HttpClient.java transport): a deployable-anywhere client that builds
queries, optimizes the plan client-side, installs them over HTTP, and
runs them against serving workers — WITHOUT the framework (or jax)
installed.  Importable on any Python >= 3.8.

Usage::

    from gsl_client import Graph
    g = Graph("127.0.0.1", 8000)
    q = (g.V("item").batch(4).alias("src")
          .outV("rel").sample(3).by("topk").alias("h1"))
    qid = g.install(q, micro_batch=32)
    out = g.run(qid, [0, 10, 20])
    out["h1"]["ids"][0] ...

Branching queries use ``each``::

    q = g.V("item").batch(4).alias("src").each(
        lambda v: v.outV("rel").sample(3).by("topk").alias("h1"),
        lambda v: v.outNeg("rel").sample(2).by("random").alias("neg"))

``Graph.install`` runs the fusion optimizer first: structurally identical
DETERMINISTIC sibling hops (same parent/kind/edge/count, strategy in
topk/by_order/full) are merged and children re-parented — the analogue of
FusionRule.java's duplicate-VERTEX_SAMPLER fusion (deterministic nodes
provably produce identical results, so fusing is semantics-preserving;
random-strategy duplicates are left alone).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Callable, List, Optional

_DETERMINISTIC = ("topk", "by_order", "full")

_NODE_DEFAULTS = dict(
    edge_type=None, node_type=None, alias_name=None, count=0,
    strategy="random", base_strategy="random", filter_alias=None,
    condition=None, walk_len=0, walk_p=1.0, walk_q=1.0, nbr_cap=None,
    need_dist=False,
)


class _Node(dict):
    """One plan record; dict so it serializes as-is."""

    def __init__(self, kind: str, parent: Optional["_Node"], **kw):
        super().__init__(_NODE_DEFAULTS)
        self.update(kind=kind, **kw)
        self["endpoint"] = kw.pop("endpoint", False)
        self.parent_node = parent


class Traversal:
    """Fluent query builder -> plan JSON (gsl/plan.py schema)."""

    def __init__(self, kind: str, **kw):
        self._nodes: List[_Node] = []
        self._batch = 64
        src = _Node(kind, None, **kw)
        if kind == "source_v":
            src["strategy"] = "by_order"
        self._nodes.append(src)
        self._cur = src

    # -- modifiers ------------------------------------------------------
    def batch(self, n: int) -> "Traversal":
        self._batch = int(n)
        return self

    def alias(self, a: str) -> "Traversal":
        self._cur["alias_name"] = a
        return self

    def sample(self, k: int) -> "Traversal":
        self._cur["count"] = int(k)
        return self

    def by(self, strategy: str) -> "Traversal":
        self._cur["strategy"] = strategy
        return self

    def filter(self, target_alias: str) -> "Traversal":
        self._cur["filter_alias"] = target_alias
        return self

    def where(self, target_alias: str, condition: dict) -> "Traversal":
        self._cur["filter_alias"] = target_alias
        self._cur["condition"] = dict(condition)
        self._cur["base_strategy"] = self._cur["strategy"]
        self._cur["strategy"] = "conditional"
        return self

    # -- hops -----------------------------------------------------------
    def _hop(self, kind: str, edge: str) -> "Traversal":
        n = _Node(kind, self._cur, edge_type=edge)
        self._nodes.append(n)
        self._cur = n
        return self

    def outV(self, edge: str) -> "Traversal":
        return self._hop("out_v", edge)

    def inV(self, edge: str) -> "Traversal":
        return self._hop("in_v", edge)

    def outE(self, edge: str) -> "Traversal":
        return self._hop("out_e", edge)

    def inE(self, edge: str) -> "Traversal":
        return self._hop("in_e", edge)

    def outNeg(self, edge: str) -> "Traversal":
        return self._hop("out_neg", edge)

    def inNeg(self, edge: str) -> "Traversal":
        return self._hop("in_neg", edge)

    def random_walk(self, walk_len: int, edge_type: str, p: float = 1.0,
                    q: float = 1.0) -> "Traversal":
        n = _Node("walk", self._cur, edge_type=edge_type)
        n.update(walk_len=int(walk_len), walk_p=float(p), walk_q=float(q))
        self._nodes.append(n)
        self._cur = n
        return self

    def each(self, *branches: Callable[["Traversal"], object]) -> "Traversal":
        """Branch the query: every callable receives a cursor positioned
        at this node (reference Traversal has linear paths only; the
        Python GSL's .each, dag_node.py:294)."""
        root = self._cur
        for fn in branches:
            self._cur = root
            fn(self)
        self._cur = root
        return self

    # -- plan -----------------------------------------------------------
    def plan(self) -> dict:
        nodes = []
        nid_of = {}
        for i, n in enumerate(self._nodes):
            nid_of[id(n)] = i
        for i, n in enumerate(self._nodes):
            rec = {k: v for k, v in n.items()}
            rec["nid"] = i
            rec["parent"] = (nid_of[id(n.parent_node)]
                             if n.parent_node is not None else None)
            nodes.append(rec)
        return {"batch_size": self._batch, "nodes": nodes}


def fuse_plan(plan: dict) -> dict:
    """Client-side plan fusion (FusionRule.java analogue).

    Merges structurally identical sibling nodes whose strategy is
    deterministic (topk / by_order / full) — duplicates provably return
    identical results, so children re-parent onto the first occurrence
    and the duplicate is dropped.  Alias handling: the kept node takes
    the first non-null alias among the duplicates; a duplicate carrying
    a DIFFERENT alias is not fused (both result keys must survive).
    Random-strategy nodes never fuse (independent draws differ).
    """
    nodes = sorted(plan["nodes"], key=lambda r: r["nid"])
    keep: List[dict] = []
    remap = {}
    seen = {}
    for rec in nodes:
        parent = remap.get(rec["parent"], rec["parent"])
        rec = dict(rec, parent=parent)
        key = (parent, rec["kind"], rec["edge_type"], rec["node_type"],
               rec["count"], rec["strategy"], rec.get("walk_len", 0),
               rec.get("nbr_cap"), bool(rec.get("need_dist")),
               rec.get("filter_alias"),
               json.dumps(rec.get("condition"), sort_keys=True))
        fusable = (rec["strategy"] in _DETERMINISTIC
                   and rec["kind"] not in ("source_v", "source_e"))
        if fusable and key in seen:
            prev = seen[key]
            if (rec["alias_name"] is None
                    or prev["alias_name"] in (None, rec["alias_name"])):
                if prev["alias_name"] is None:
                    prev["alias_name"] = rec["alias_name"]
                remap[rec["nid"]] = prev["nid"]
                continue
        if fusable:
            seen[key] = rec
        keep.append(rec)
    # renumber densely
    new_id = {rec["nid"]: i for i, rec in enumerate(keep)}
    for nid, tgt in remap.items():
        new_id[nid] = new_id[tgt]
    out = []
    for rec in keep:
        rec = dict(rec)
        rec["parent"] = (new_id[rec["parent"]]
                         if rec["parent"] is not None else None)
        rec["nid"] = new_id[rec["nid"]]
        out.append(rec)
    return {"batch_size": plan["batch_size"], "nodes": out}


class Graph:
    """Client entry point: install/run/schema/stats/update/refresh over
    the serving worker's HTTP surface (online/http.py routes)."""

    def __init__(self, host: str, port: int, timeout: float = 60.0):
        self._base = "http://%s:%d" % (host, port)
        self._timeout = timeout

    # -- query construction --------------------------------------------
    def V(self, node_type: str) -> Traversal:
        return Traversal("source_v", node_type=node_type)

    def E(self, edge_type: str) -> Traversal:
        return Traversal("source_e", edge_type=edge_type)

    # -- HTTP -----------------------------------------------------------
    def _get(self, path: str):
        with urllib.request.urlopen(self._base + path,
                                    timeout=self._timeout) as r:
            return json.loads(r.read().decode())

    def _post(self, path: str, body: dict):
        req = urllib.request.Request(
            self._base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self._timeout) as r:
            return json.loads(r.read().decode())

    # -- API ------------------------------------------------------------
    def schema(self):
        return self._get("/admin/schema")

    def install(self, q: Traversal, micro_batch: int = 256,
                fuse: bool = True) -> int:
        plan = q.plan()
        if fuse:
            plan = fuse_plan(plan)
        plan["micro_batch"] = int(micro_batch)
        return int(self._post("/admin/query", plan)["qid"])

    def run(self, qid: int, ids) -> dict:
        return self._post("/serving", {"qid": int(qid),
                                       "ids": [int(i) for i in ids]})

    def stats(self, qid: int) -> dict:
        return self._get("/admin/query/stats?qid=%d" % qid)

    def install_model(self, name: str, artifact) -> dict:
        """Install an exported sample+forward artifact (the Java
        client's TF-serving predict role, gsl_client/.../predict/):
        ``artifact`` is a server-local path or raw exported bytes."""
        if isinstance(artifact, (bytes, bytearray)):
            import base64
            return self._post("/admin/model", {
                "name": name,
                "artifact_b64": base64.b64encode(bytes(artifact)).decode()})
        return self._post("/admin/model", {"name": name,
                                           "artifact": artifact})

    def predict(self, model: str, ids, seed: int = 0):
        return self._post("/predict", {"model": model,
                                       "ids": [int(i) for i in ids],
                                       "seed": int(seed)})["outputs"]

    def update(self, nodes: Optional[dict] = None,
               edges: Optional[dict] = None) -> dict:
        return self._post("/admin/update", {"nodes": nodes or {},
                                            "edges": edges or {}})

    def refresh(self) -> dict:
        return self._post("/admin/refresh", {})
