"""GSL query plan wire format: JSON-serializable install/run plans.

TPU-native equivalent of the DGS query-plan wire format
(reference: dynamic_graph_service/fbs/query_plan.fbs + plan_node.fbs:33 —
the Java GSL client serializes a fluent traversal into a PlanNode JSON
tree posted to the coordinator, gsl_client parser/Plan.java).  Here the
plan is plain JSON: one record per DagNode carrying kind/type/fanout/
strategy/alias plus parent linkage, so remote clients can install queries
over HTTP (online/http.py) without sharing Python objects.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.gsl.dag import Dag, DagNode, EndpointNode

_FIELDS = ("kind", "edge_type", "node_type", "alias_name", "count",
           "strategy", "base_strategy", "filter_alias", "condition",
           "walk_len", "walk_p", "walk_q", "nbr_cap", "need_dist")


def query_to_plan(query) -> dict:
    """Serialize a built Query's DAG to a JSON-safe plan dict."""
    dag = query.dag
    nodes: List[dict] = []
    for n in dag.nodes:
        rec = {f: getattr(n, f) for f in _FIELDS}
        rec["nid"] = n.nid
        rec["parent"] = n.parent.nid if n.parent is not None else None
        rec["endpoint"] = isinstance(n, EndpointNode)
        nodes.append(rec)
    return {"batch_size": dag.batch_size, "nodes": nodes}


def plan_to_query(graph, plan: dict):
    """Rebuild an executable Query from a plan dict against ``graph``."""
    dag = Dag(graph)
    dag.batch_size = int(plan.get("batch_size", 64))
    by_nid: Dict[int, DagNode] = {}
    for rec in sorted(plan["nodes"], key=lambda r: r["nid"]):
        parent = by_nid.get(rec["parent"]) if rec["parent"] is not None \
            else None
        if rec["parent"] is not None and parent is None:
            raise InvalidArgumentError(
                "plan node %r references unknown parent %r"
                % (rec["nid"], rec["parent"]))
        if rec.get("endpoint"):
            kind = ("out_v" if rec["kind"] == "endpoint_src" else "in_v")
            node = EndpointNode(dag, kind, parent)
        else:
            node = DagNode(dag, rec["kind"], parent,
                           edge_type=rec["edge_type"],
                           node_type=rec["node_type"])
        for f in _FIELDS:
            if f == "kind" or (rec.get("endpoint") and f == "edge_type"):
                continue
            if f in rec and rec[f] is not None:
                setattr(node, f, rec[f])
        if node.condition:
            # same key validation the builder path applies in
            # DagNode.where() — remote clients get the error, not
            # silently-ignored typo'd condition keys
            for kk in node.condition:
                if kk not in DagNode._WHERE_KEYS:
                    raise InvalidArgumentError(
                        "condition %r is not supported." % kk)
        if node.alias_name:
            dag.register_alias(node.alias_name, node)
        by_nid[rec["nid"]] = node
    if not dag.nodes or dag.nodes[0].kind not in ("source_v", "source_e"):
        raise InvalidArgumentError("plan must start at a V()/E() source")
    from graph_learn_tpu.gsl.compile import Query
    return Query(dag)
