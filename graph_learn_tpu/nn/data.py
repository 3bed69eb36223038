"""Model-facing data structures: EgoGraph (dense hop tensors).

Parity with the reference EgoGraph
(reference: graphlearn/python/nn/tf/data/egograph.py:23-130): a centric
batch of src nodes plus K hops of fixed-fanout neighbors; hop i has shape
[b, k1, ..., ki].  The reference's ``transform()`` (feature encoding) lives
in the model here (nn/feature_column.py) because embedding tables are
parameters.

BatchGraph (SubGraph batching) lives in nn/subgraph_data.py.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from graph_learn_tpu.core.values import Nodes


@struct.dataclass
class EgoGraph:
    """src + K hops of neighbor Nodes.

    hops[i].ids has shape [b, k1, ..., k_{i+1}]; nbr_nums = [k1, ..., kK].
    """

    src: Nodes
    hops: List[Nodes] = struct.field(default_factory=list)
    nbr_nums: Sequence[int] = struct.field(pytree_node=False, default=())

    @property
    def batch_size(self) -> int:
        return self.src.ids.shape[0]

    def hop_node(self, i: int) -> Nodes:
        return self.hops[i]

    @classmethod
    def from_query_result(cls, result: dict, src_alias: str,
                          hop_aliases: Sequence[str]) -> "EgoGraph":
        src = result[src_alias]
        hops = [result[a] for a in hop_aliases]
        nbr_nums = tuple(h.ids.shape[-1] for h in hops)
        return cls(src=src, hops=list(hops), nbr_nums=nbr_nums)
