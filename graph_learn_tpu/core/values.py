"""Result value types: Nodes, Edges, SparseNodes, SparseEdges, SubGraph.

Parity with the reference value objects
(reference: graphlearn/python/data/values.py:31-843), re-designed as JAX
pytrees so GSL query results flow straight into jitted model code with no
host round-trip (the reference's numpy handoff at
nn/tf/data/dataset.py:226-241 is the seam this design removes).

Shape conventions (static under jit):
- ``Nodes.ids``: int32 dense node indices, shape [batch] or [batch, k1, ...]
  (fanout-expanded hops keep their nested shape, like the reference's
  ``Nodes.shape``).
- ``SparseNodes``: full-neighbor results; fixed cap C per seed with
  ``degrees`` giving true counts and a mask for the padded tail
  (the reference returns truly ragged SparseNodes; on TPU raggedness
  becomes cap + mask, cap = GLOBAL default_full_nbr_num or sample count).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Nodes:
    """A batch of nodes (possibly fanout-shaped)."""

    ids: jax.Array  # int32 dense indices, [*, ]
    raw_ids: Optional[jax.Array] = None  # original int64 source ids
    int_attrs: Optional[jax.Array] = None  # [*, n_int] int32
    float_attrs: Optional[jax.Array] = None  # [*, n_float] float
    multival_attrs: Optional[jax.Array] = None  # [*, n_mv, max_len] int32
    multival_lens: Optional[jax.Array] = None  # [*, n_mv] int32
    weights: Optional[jax.Array] = None  # [*]
    labels: Optional[jax.Array] = None  # [*] int32
    timestamps: Optional[jax.Array] = None  # [*] int64
    out_degrees: Optional[jax.Array] = None  # [*] int32 (per queried edge type)
    type_name: str = struct.field(pytree_node=False, default="")

    @property
    def shape(self):
        return self.ids.shape

    @property
    def batch_size(self):
        return self.ids.shape[0]

    def flat(self) -> "Nodes":
        """Flatten fanout dims into one leading dim."""
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[len(self.ids.shape):]), self)


@struct.dataclass
class SparseNodes:
    """Full-neighbor (variable-degree) nodes: cap + mask representation.

    ``ids`` is [batch, cap]; ``degrees`` is [batch] true neighbor counts
    (clipped to cap); entries with index >= degree are padding.
    Equivalent of reference SparseNodes offsets/indices/dense_shape
    (values.py:381-469): ``offsets()`` reconstructs the prefix layout.
    """

    ids: jax.Array  # [b, cap] int32
    degrees: jax.Array  # [b] int32
    raw_ids: Optional[jax.Array] = None
    int_attrs: Optional[jax.Array] = None
    float_attrs: Optional[jax.Array] = None
    multival_attrs: Optional[jax.Array] = None
    multival_lens: Optional[jax.Array] = None
    weights: Optional[jax.Array] = None
    labels: Optional[jax.Array] = None
    timestamps: Optional[jax.Array] = None
    type_name: str = struct.field(pytree_node=False, default="")

    @property
    def cap(self) -> int:
        return self.ids.shape[-1]

    @property
    def dense_shape(self):
        return self.ids.shape

    def mask(self) -> jax.Array:
        """[b, cap] bool validity mask."""
        pos = jnp.arange(self.cap, dtype=jnp.int32)[None, :]
        return pos < self.degrees[:, None]

    def offsets(self) -> jax.Array:
        """[b+1] exclusive prefix-sum of degrees (reference offsets)."""
        return jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(self.degrees).astype(jnp.int32)
        ])


@struct.dataclass
class Edges:
    """A batch of edges with src/dst node views.

    Parity: reference Edges exposes src_nodes/dst_nodes Nodes views plus
    edge ids/weights/labels (values.py:471-543).
    """

    edge_ids: jax.Array  # [*] int32 dense edge indices (per edge type)
    src_nodes: Nodes
    dst_nodes: Nodes
    int_attrs: Optional[jax.Array] = None
    float_attrs: Optional[jax.Array] = None
    multival_attrs: Optional[jax.Array] = None
    multival_lens: Optional[jax.Array] = None
    weights: Optional[jax.Array] = None
    labels: Optional[jax.Array] = None
    timestamps: Optional[jax.Array] = None
    type_name: str = struct.field(pytree_node=False, default="")

    @property
    def shape(self):
        return self.edge_ids.shape

    @property
    def src_ids(self):
        return self.src_nodes.ids

    @property
    def dst_ids(self):
        return self.dst_nodes.ids


@struct.dataclass
class SparseEdges:
    """Full-neighbor edges (cap + degrees), src is the seed per row."""

    edge_ids: jax.Array  # [b, cap]
    degrees: jax.Array  # [b]
    src_nodes: Nodes  # [b]
    dst_nodes: SparseNodes  # [b, cap]
    weights: Optional[jax.Array] = None
    labels: Optional[jax.Array] = None
    timestamps: Optional[jax.Array] = None
    type_name: str = struct.field(pytree_node=False, default="")

    def mask(self) -> jax.Array:
        pos = jnp.arange(self.edge_ids.shape[-1], dtype=jnp.int32)[None, :]
        return pos < self.degrees[:, None]


@struct.dataclass
class SubGraphVal:
    """An induced subgraph: edge_index over a node set.

    Parity: reference SubGraph (values.py: SubGraph; subgraph_sampler.cc
    emits edge_index rows/cols + node ids).  ``edge_index`` is [2, E_cap]
    with ``num_edges`` valid entries; ``node_ids`` is [N_cap] with
    ``num_nodes`` valid.  Optional BFS distances (SEAL) are dist_to_src /
    dist_to_dst.
    """

    node_ids: jax.Array  # [N_cap] int32 dense node indices
    num_nodes: jax.Array  # scalar int32
    edge_index: jax.Array  # [2, E_cap] int32, local (subgraph) indices
    num_edges: jax.Array  # scalar int32
    nodes: Optional[Nodes] = None  # looked-up node payload, [N_cap]
    edge_ids: Optional[jax.Array] = None  # [E_cap] global edge indices
    dist_to_src: Optional[jax.Array] = None  # [N_cap] int32
    dist_to_dst: Optional[jax.Array] = None  # [N_cap] int32
    type_name: str = struct.field(pytree_node=False, default="")

    def node_mask(self) -> jax.Array:
        return jnp.arange(self.node_ids.shape[0], dtype=jnp.int32) < self.num_nodes

    def edge_mask(self) -> jax.Array:
        return jnp.arange(self.edge_index.shape[1], dtype=jnp.int32) < self.num_edges
