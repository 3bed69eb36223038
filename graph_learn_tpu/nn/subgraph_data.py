"""BatchGraph: batched per-sample subgraphs with offset-rebased edge_index.

Parity with the reference BatchGraph
(reference: graphlearn/python/nn/tf/data/batchgraph.py:182-255
``from_graphs`` — concatenates per-sample SubGraphs, records node/edge
offsets, rebases edge_index; flatten/from_tensors round trip for tf.data).

TPU shape-static translation: per-sample subgraphs share fixed caps
(N_cap nodes, E_cap edges), so batching is a reshape: sample i's node j is
global node i*N_cap + j.  Validity masks carry raggedness.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from graph_learn_tpu.core.values import Nodes, SubGraphVal


@struct.dataclass
class BatchGraph:
    """B per-sample subgraphs merged into one disjoint graph."""

    edge_index: jax.Array  # [2, B*E_cap] rebased
    node_ids: jax.Array  # [B*N_cap] store indices (padding -> 0)
    node_mask: jax.Array  # [B*N_cap] bool
    edge_mask: jax.Array  # [B*E_cap] bool
    graph_ids: jax.Array  # [B*N_cap] which sample each node belongs to
    num_samples: int = struct.field(pytree_node=False, default=0)
    node_cap: int = struct.field(pytree_node=False, default=0)
    nodes: Optional[Nodes] = None  # payload for all node slots
    dist_to_src: Optional[jax.Array] = None  # [B*N_cap]
    dist_to_dst: Optional[jax.Array] = None

    @property
    def num_nodes(self) -> int:
        return self.node_ids.shape[0]

    @classmethod
    def from_subgraphs(cls, sg: SubGraphVal) -> "BatchGraph":
        """sg: a vmapped SubGraphVal with leading batch dim B."""
        B, N_cap = sg.node_ids.shape
        E_cap = sg.edge_index.shape[-1]
        # sg.edge_index is [B, 2, E_cap]; add per-sample node offsets
        offs = (jnp.arange(B, dtype=jnp.int32) * N_cap)[:, None, None]
        ei = sg.edge_index + offs
        edge_index = ei.transpose(1, 0, 2).reshape(2, B * E_cap)
        node_mask = (jnp.arange(N_cap, dtype=jnp.int32)[None, :]
                     < sg.num_nodes[:, None]).reshape(-1)
        edge_mask = (jnp.arange(E_cap, dtype=jnp.int32)[None, :]
                     < sg.num_edges[:, None]).reshape(-1)
        fill = jnp.int32(2**31 - 1)
        node_ids = jnp.where(sg.node_ids == fill, 0, sg.node_ids).reshape(-1)
        graph_ids = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, N_cap)).reshape(-1)
        nodes = None
        if sg.nodes is not None:
            nodes = jax.tree.map(
                lambda x: x.reshape((B * N_cap,) + x.shape[2:]), sg.nodes)
        d2s = (sg.dist_to_src.reshape(-1)
               if sg.dist_to_src is not None else None)
        d2d = (sg.dist_to_dst.reshape(-1)
               if sg.dist_to_dst is not None else None)
        return cls(edge_index=edge_index, node_ids=node_ids,
                   node_mask=node_mask, edge_mask=edge_mask,
                   graph_ids=graph_ids, num_samples=B, node_cap=N_cap,
                   nodes=nodes, dist_to_src=d2s, dist_to_dst=d2d)

    @classmethod
    def from_edge_star(cls, src, dst, src_nbrs, dst_nbrs) -> "BatchGraph":
        """Per-edge enclosing star subgraphs, batched shape-static.

        Parity with the reference EdgeInducer
        (reference: graphlearn/examples/tf/sage/edge_inducer.py:29-107):
        each sample's node list is [src, dst, src_nbrs..., dst_nbrs...],
        edges connect src<->each src_nbr and dst<->each dst_nbr (both
        directions, gen_edge_index :97-107).  ``src``/``dst`` are Nodes
        [b]; ``src_nbrs``/``dst_nbrs`` are SparseNodes [b, cap] from a
        ``full`` (or fixed-fanout) hop.  Sample i's node j lives at global
        slot i*N_cap+j, so the result is a standard BatchGraph.
        """
        b = src.ids.shape[0]
        ks = src_nbrs.ids.shape[-1]
        kd = dst_nbrs.ids.shape[-1]
        n_cap = 2 + ks + kd
        dst_ids = dst.ids.reshape(b, -1)[:, 0]  # neg dst may be [b, 1]
        node_ids = jnp.concatenate(
            [src.ids[:, None], dst_ids[:, None],
             src_nbrs.ids.reshape(b, ks), dst_nbrs.ids.reshape(b, kd)],
            axis=1)  # [b, n_cap]
        sm = src_nbrs.mask().reshape(b, ks)
        dm = dst_nbrs.mask().reshape(b, kd)
        node_mask = jnp.concatenate(
            [jnp.ones((b, 2), bool), sm, dm], axis=1).reshape(-1)

        # per-sample edge template: src star then dst star, both dirs
        s_cols = jnp.arange(2, 2 + ks, dtype=jnp.int32)
        d_cols = jnp.arange(2 + ks, n_cap, dtype=jnp.int32)
        rows = jnp.concatenate([
            jnp.zeros(ks, jnp.int32), s_cols,
            jnp.ones(kd, jnp.int32), d_cols])
        cols = jnp.concatenate([
            s_cols, jnp.zeros(ks, jnp.int32),
            d_cols, jnp.ones(kd, jnp.int32)])
        e_cap = rows.shape[0]
        offs = (jnp.arange(b, dtype=jnp.int32) * n_cap)[:, None]
        edge_index = jnp.stack([
            (rows[None, :] + offs).reshape(-1),
            (cols[None, :] + offs).reshape(-1)], axis=0)
        e_mask = jnp.concatenate([sm, sm, dm, dm], axis=1).reshape(-1)

        graph_ids = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, n_cap)).reshape(-1)

        def _cat(field):
            vs = [getattr(v, field) for v in (src, dst, src_nbrs, dst_nbrs)]
            if any(v is None for v in vs):
                return None
            d = vs[0].shape[-1]
            parts = [vs[0].reshape(b, 1, d), vs[1].reshape(b, 1, d),
                     vs[2].reshape(b, ks, d), vs[3].reshape(b, kd, d)]
            return jnp.concatenate(parts, axis=1).reshape(b * n_cap, d)

        nodes = Nodes(ids=node_ids.reshape(-1),
                      int_attrs=_cat("int_attrs"),
                      float_attrs=_cat("float_attrs"),
                      type_name=src.type_name)
        return cls(edge_index=edge_index, node_ids=node_ids.reshape(-1),
                   node_mask=node_mask, edge_mask=e_mask,
                   graph_ids=graph_ids, num_samples=b, node_cap=n_cap,
                   nodes=nodes)

    def anchor(self, h: jax.Array, slot: int) -> jax.Array:
        """Embedding of per-sample node ``slot`` (0=src, 1=dst) -> [B, d]."""
        idx = jnp.arange(self.num_samples, dtype=jnp.int32) * self.node_cap \
            + slot
        return h[idx]

    def readout(self, h: jax.Array, op: str = "mean") -> jax.Array:
        """Per-sample pooling of node embeddings -> [B, d]."""
        hm = jnp.where(self.node_mask[:, None], h, 0.0)
        s = jax.ops.segment_sum(hm, self.graph_ids,
                                num_segments=self.num_samples)
        if op == "sum":
            return s
        cnt = jax.ops.segment_sum(self.node_mask.astype(h.dtype),
                                  self.graph_ids,
                                  num_segments=self.num_samples)
        if op == "mean":
            return s / jnp.maximum(cnt, 1.0)[:, None]
        if op == "max":
            hneg = jnp.where(self.node_mask[:, None], h, -jnp.inf)
            m = jax.ops.segment_max(hneg, self.graph_ids,
                                    num_segments=self.num_samples)
            return jnp.where(jnp.isfinite(m), m, 0.0)
        raise ValueError(op)


@struct.dataclass
class HeteroBatchGraph:
    """B per-sample HETERO subgraphs merged into disjoint typed graphs.

    Parity with the reference HeteroBatchGraph
    (reference: graphlearn/python/nn/tf/data/hetero_batchgraph.py:33-120 —
    per-type concatenation with per-sample offset records).  Shape-static
    translation: each node type t has a fixed per-sample slot count
    N_cap[t], so sample i's local node j of type t is global slot
    i*N_cap[t]+j; per-edge-type edge_index is rebased into the src/dst
    types' slot spaces.  Feeds nn.layers.sub.HeteroConv directly.
    """

    edge_index: Dict[str, jax.Array]  # et -> [2, B*E_cap_et] (src;dst rows)
    edge_mask: Dict[str, jax.Array]  # et -> [B*E_cap_et] bool
    nodes: Dict[str, Nodes]  # t -> payload for all slots [B*N_cap_t, ...]
    node_mask: Dict[str, jax.Array]  # t -> [B*N_cap_t] bool
    graph_ids: Dict[str, jax.Array]  # t -> [B*N_cap_t] sample index
    num_samples: int = struct.field(pytree_node=False, default=0)
    node_cap: Dict[str, int] = struct.field(pytree_node=False,
                                            default_factory=dict)
    topology: Dict[str, tuple] = struct.field(pytree_node=False,
                                              default_factory=dict)

    @classmethod
    def from_samples(cls, nodes_dict, node_masks, edge_index_dict,
                     edge_masks, topology) -> "HeteroBatchGraph":
        """Batch per-sample typed node slots + local edge indices.

        nodes_dict[t]: Nodes with arrays shaped [B, N_cap_t, ...];
        node_masks[t]: [B, N_cap_t] bool; edge_index_dict[et]:
        [B, 2, E_cap] LOCAL (per-sample, per-type) indices —
        row 0 indexes the src type's slots, row 1 the dst type's;
        topology[et] = (src_type, dst_type).
        """
        b = next(iter(node_masks.values())).shape[0]
        caps = {t: m.shape[1] for t, m in node_masks.items()}
        nodes, nmask, gids = {}, {}, {}
        for t, nv in nodes_dict.items():
            n_cap = caps[t]
            nodes[t] = jax.tree.map(
                lambda x: x.reshape((b * n_cap,) + x.shape[2:]), nv)
            nmask[t] = node_masks[t].reshape(-1)
            gids[t] = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.int32)[:, None],
                (b, n_cap)).reshape(-1)
        ei, em = {}, {}
        for et, local in edge_index_dict.items():
            s_t, d_t = topology[et]
            offs_s = (jnp.arange(b, dtype=jnp.int32) * caps[s_t])[:, None]
            offs_d = (jnp.arange(b, dtype=jnp.int32) * caps[d_t])[:, None]
            src = (local[:, 0, :] + offs_s).reshape(-1)
            dst = (local[:, 1, :] + offs_d).reshape(-1)
            ei[et] = jnp.stack([src, dst], axis=0)
            em[et] = edge_masks[et].reshape(-1)
        return cls(edge_index=ei, edge_mask=em, nodes=nodes,
                   node_mask=nmask, graph_ids=gids, num_samples=b,
                   node_cap=dict(caps), topology=dict(topology))

    def anchor(self, h: jax.Array, node_type: str, slot: int) -> jax.Array:
        """Embedding of per-sample slot ``slot`` of a type -> [B, d]."""
        idx = jnp.arange(self.num_samples, dtype=jnp.int32) \
            * self.node_cap[node_type] + slot
        return h[idx]

    def readout(self, h: jax.Array, node_type: str,
                op: str = "mean") -> jax.Array:
        """Per-sample pooling of one type's node embeddings -> [B, d]."""
        m = self.node_mask[node_type]
        g = self.graph_ids[node_type]
        hm = jnp.where(m[:, None], h, 0.0)
        s = jax.ops.segment_sum(hm, g, num_segments=self.num_samples)
        if op == "sum":
            return s
        cnt = jax.ops.segment_sum(m.astype(h.dtype), g,
                                  num_segments=self.num_samples)
        return s / jnp.maximum(cnt, 1.0)[:, None]
