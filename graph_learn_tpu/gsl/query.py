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
    if isinstance(mask, str):
        mask = Mask[mask.upper()]
    mask = mask or Mask.NONE
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
