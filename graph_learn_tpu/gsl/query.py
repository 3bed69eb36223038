"""GSL entry points: g.V(...) / g.E(...).

Parity: reference Graph.V/E (graphlearn/python/graph.py:551-628).
"""

from __future__ import annotations

from typing import Optional, Union

from graph_learn_tpu.core.schema import Mask, mask_type
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.gsl.dag import Dag, DagNode


def v_entry(graph, t: str, node_from=None,
            mask: Union[Mask, str, None] = Mask.NONE) -> DagNode:
    from graph_learn_tpu.core.schema import NodeFrom
    if isinstance(mask, str):
        mask = Mask[mask.upper()]
    mask = mask or Mask.NONE
    if isinstance(node_from, str):
        node_from = NodeFrom[node_from.upper()]
    if node_from in (NodeFrom.EDGE_SRC, NodeFrom.EDGE_DST):
        # t is an EDGE type; seed space = its distinct src/dst nodes
        # (reference NodeFrom.EDGE_SRC/EDGE_DST, graph.py:570-574; storage
        # GetAllSrcIds/GetAllDstIds)
        if mask != Mask.NONE:
            raise InvalidArgumentError(
                "mask is only valid with node_from=NODE")
        import numpy as np

        from graph_learn_tpu.core.store import NodeSet
        et = graph.store.edge_table(t)
        is_src = node_from == NodeFrom.EDGE_SRC
        typed = ("ESRC*" if is_src else "EDST*") + t
        if typed not in graph.store.node_sets:
            col = et.src if is_src else et.dst
            graph.store.add_node_set(NodeSet(
                type_name=typed,
                base_type=et.src_type if is_src else et.dst_type,
                indices=np.unique(col).astype(np.int32)))
    else:
        typed = mask_type(t, mask)
    # validate early
    graph.store.node_set(typed)
    dag = Dag(graph)
    node = DagNode(dag, "source_v", None, node_type=typed)
    return node


def e_entry(graph, edge_type: str) -> DagNode:
    graph.store.edge_table(edge_type)
    dag = Dag(graph)
    node = DagNode(dag, "source_e", None, edge_type=edge_type)
    return node
