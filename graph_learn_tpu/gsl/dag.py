"""GSL query builder: the fluent traversal DAG.

API parity with the reference GSL
(reference: graphlearn/python/gsl/dag_node.py:33-793, dag.py:25-132):
``g.V(t).batch(b).shuffle().alias('src').outV(e).sample(k).by('random')
.alias('hop1').values()`` plus E/outE/inE/outNeg/inNeg/each/filter/
random_walk/SubGraph.

TPU redesign: instead of serialising to a DagDef proto executed by a
server-side scheduler into Tapes, the finished DAG compiles to ONE jitted
device function (gsl/compile.py) — lookups and degrees are fused gathers,
the Tape/scheduler machinery is subsumed by jax.jit + host seed prefetch.
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, List, Optional

from graph_learn_tpu.errors import InvalidArgumentError

_VALID_SAMPLERS = ("random", "topk", "in_degree", "edge_weight", "full",
                   "random_without_replacement")
_VALID_NEG = ("random", "in_degree", "soft_in_degree", "node_weight",
              "conditional")


class Dag:
    def __init__(self, graph):
        self.graph = graph
        self.nodes: List["DagNode"] = []
        self.batch_size: int = 64
        self._alias: Dict[str, DagNode] = {}
        self._counter = itertools.count()

    def add(self, node: "DagNode"):
        node.nid = next(self._counter)
        self.nodes.append(node)

    def register_alias(self, alias: str, node: "DagNode"):
        if alias in self._alias:
            raise InvalidArgumentError("duplicate alias %r" % alias)
        self._alias[alias] = node

    def get_node(self, alias: str) -> "DagNode":
        if alias not in self._alias:
            raise InvalidArgumentError("unknown alias %r" % alias)
        return self._alias[alias]

    @property
    def aliased_nodes(self) -> Dict[str, "DagNode"]:
        return dict(self._alias)


class DagNode:
    """One traversal step."""

    def __init__(self, dag: Dag, kind: str, parent: Optional["DagNode"],
                 edge_type: Optional[str] = None,
                 node_type: Optional[str] = None):
        self.dag = dag
        self.kind = kind  # source_v | source_e | out_v | in_v | out_e |
        #                   in_e | out_neg | in_neg | walk | subgraph
        self.parent = parent
        self.edge_type = edge_type
        self.node_type = node_type
        self.nid = -1
        self.alias_name: Optional[str] = None
        self.count = 0  # sample fanout
        self.strategy = "by_order" if kind in ("source_v", "source_e") else "random"
        self.base_strategy = "random"  # unconditioned draw for .where()
        self.filter_alias: Optional[str] = None
        self.condition: Optional[dict] = None
        self.walk_len = 0
        self.walk_p = 1.0
        self.walk_q = 1.0
        self.nbr_cap: Optional[int] = None  # subgraph neighbor cap
        self.need_dist = False
        dag.add(self)

    # --- shared fluent API (dag_node.py:163-258) ----------------------
    def alias(self, name: str) -> "DagNode":
        self.alias_name = name
        self.dag.register_alias(name, self)
        return self

    def batch(self, batch_size: int) -> "DagNode":
        if self.kind not in ("source_v", "source_e"):
            raise InvalidArgumentError(".batch() only on V()/E() sources")
        self.dag.batch_size = int(batch_size)
        self.strategy = "by_order"
        return self

    def shuffle(self, traverse: bool = False) -> "DagNode":
        if self.kind not in ("source_v", "source_e"):
            raise InvalidArgumentError(".shuffle() only on V()/E() sources")
        self.strategy = "shuffle" if traverse else "random"
        return self

    def sample(self, count: int) -> "DagNode":
        if self.kind not in ("out_v", "in_v", "out_e", "in_e", "out_neg",
                             "in_neg"):
            raise InvalidArgumentError(".sample() only after a hop")
        self.count = int(count)
        return self

    def by(self, strategy: str) -> "DagNode":
        if self.kind in ("out_neg", "in_neg"):
            if strategy not in _VALID_NEG:
                raise InvalidArgumentError(
                    "negative strategy %r not in %r" % (strategy, _VALID_NEG))
        elif self.kind in ("out_v", "in_v", "out_e", "in_e"):
            from graph_learn_tpu.ops.sampling import STRATEGY_FNS
            if strategy not in _VALID_SAMPLERS and \
                    strategy not in STRATEGY_FNS:
                raise InvalidArgumentError(
                    "sampler strategy %r not in %r nor registered"
                    % (strategy, _VALID_SAMPLERS))
        else:
            raise InvalidArgumentError(".by() only after .sample()")
        self.strategy = strategy
        return self

    def filter(self, target: str) -> "DagNode":
        """Reject samples equal to the target node's ids (dag_node.py:212)."""
        self.filter_alias = target if isinstance(target, str) else target.alias_name
        return self

    _WHERE_KEYS = ("batch_share", "unique", "int_cols", "int_props",
                   "float_cols", "float_props", "str_cols", "str_props")

    def where(self, target: str, condition: Optional[dict] = None) -> "DagNode":
        """Conditional negative sampling (dag_node.py:233).

        The strategy set by ``.by()`` becomes the base (unconditioned)
        draw; conditioned quotas come from condition's
        int_cols/int_props/float_cols/float_props/str_cols/str_props;
        ``batch_share``/``unique`` control the rejection set
        (dag_node.py:240-242, conditional_negative_sampler.cc:108-116).
        """
        for kk in (condition or {}):
            if kk not in self._WHERE_KEYS:
                raise InvalidArgumentError(
                    "condition %r is not supported." % kk)
        self.filter_alias = target if isinstance(target, str) else target.alias_name
        self.condition = dict(condition or {})
        self.base_strategy = self.strategy
        self.strategy = "conditional"
        return self

    def each(self, func: Callable[["DagNode"], object]) -> "DagNode":
        """Branch the query (dag_node.py:294)."""
        func(self)
        return self

    def values(self, func=None):
        from graph_learn_tpu.gsl.compile import Query
        return Query(self.dag, post_func=func)

    # --- hops (dag_node.py:458-532) -----------------------------------
    def _hop(self, kind: str, edge_type: Optional[str]):
        if edge_type is None:
            if (self.kind in ("source_e", "out_e", "in_e")
                    and kind in ("out_v", "in_v")):
                # E(...).outV()/inV() and outE(...).inV() etc. =
                # src/dst endpoint view of the edges
                # (reference dag_node.py:462-492 TraverseEdgeDagNode.inV)
                return EndpointNode(self.dag, kind, self)
            raise InvalidArgumentError("edge_type required")
        return DagNode(self.dag, kind, self, edge_type=edge_type)

    def outV(self, edge_type: Optional[str] = None) -> "DagNode":
        return self._hop("out_v", edge_type)

    def inV(self, edge_type: Optional[str] = None) -> "DagNode":
        return self._hop("in_v", edge_type)

    def outE(self, edge_type: str) -> "DagNode":
        return self._hop("out_e", edge_type)

    def inE(self, edge_type: str) -> "DagNode":
        return self._hop("in_e", edge_type)

    def outNeg(self, edge_type: str) -> "DagNode":
        return DagNode(self.dag, "out_neg", self, edge_type=edge_type)

    def inNeg(self, edge_type: str) -> "DagNode":
        return DagNode(self.dag, "in_neg", self, edge_type=edge_type)

    def Neg(self, node_type: str) -> "DagNode":
        # sample negatives from a node set regardless of topology
        n = DagNode(self.dag, "out_neg", self, node_type=node_type)
        return n

    def random_walk(self, walk_len: int, p: float = 1.0,
                    q: float = 1.0, edge_type: Optional[str] = None) -> "DagNode":
        n = DagNode(self.dag, "walk", self,
                    edge_type=edge_type or self.edge_type)
        n.walk_len = int(walk_len)
        n.walk_p, n.walk_q = float(p), float(q)
        return n

    def SubGraph(self, edge_type: str, nbr_cap: Optional[int] = None,
                 need_dist: bool = False) -> "DagNode":
        n = DagNode(self.dag, "subgraph", self, edge_type=edge_type)
        n.nbr_cap = nbr_cap
        n.need_dist = need_dist
        return n


class EndpointNode(DagNode):
    """src/dst endpoint view of an edge traversal (outV()/inV() of E())."""

    def __init__(self, dag, kind, parent):
        super().__init__(dag, "endpoint_" + ("src" if kind == "out_v" else "dst"),
                         parent, edge_type=parent.edge_type)
