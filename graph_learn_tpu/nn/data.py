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
class DeferredRows:
    """An unmaterialised feature-row gather: table reference + indices.

    Carried in a hop Nodes' ``float_attrs`` slot when the consumer opted
    into deferred payload (``EgoGraph.from_query_result(...,
    defer_last_table=...)``): EgoGNN aggregates the deepest hop straight
    from the table with the sorted segment gather
    (ops/aggregate.py ``gather_group_agg``) instead of materialising
    [b, k1, ..., kK, D] rows in sampled order — the dominant HBM cost of
    a fused train step on big graphs (PERF.md rule 5).  Consumers that
    need per-neighbor rows (attention convs, custom models) call
    :meth:`materialize` and proceed exactly as before.
    """

    table: jax.Array  # [N, D] feature table
    idx: jax.Array    # hop-shaped int indices

    def materialize(self) -> jax.Array:
        from graph_learn_tpu.ops.pallas.dispatch import feature_gather
        return feature_gather(self.table, self.idx)

    def group_agg(self, op: str = "mean") -> jax.Array:
        """[n_groups, D] reduction over the trailing fanout axis."""
        from graph_learn_tpu.ops.aggregate import gather_group_agg
        return gather_group_agg(self.table, self.idx, op=op)


@struct.dataclass
class PreAggregatedRows:
    """Deepest-hop features already reduced over the fanout axis.

    Produced OUTSIDE the per-step train scan by the grouped-prefetch
    pipeline (bench.py / trainers): several steps' hop indices are
    gathered + group-reduced in ONE call — XLA's gather is
    concurrency-limited at single-step index counts (PERF.md r3 frontier
    table: 15.9 -> 12.2 ns/row at 4x the indices), and pre-reducing means
    only [n_groups, D] per step is spilled to HBM between phases instead
    of the raw [n_groups * k, D] rows.  EgoGNN consumes it through the
    same ``neighbor_agg`` path as :class:`DeferredRows`; since the raw
    rows were never materialised there is no fallback — the consuming
    conv's ``deferred_op`` must match ``op``.
    """

    agg: jax.Array  # [n_groups, D] raw-attr group reduction
    op: str = struct.field(pytree_node=False, default="mean")


def pre_aggregate_hop(batch, alias: str, table: jax.Array, op: str = "mean"):
    """Pre-reduce a deepest hop's features over its fanout axis.

    Returns a new {alias: value} batch where ``batch[alias]`` carries
    :class:`PreAggregatedRows` instead of raw per-neighbor features.  Run
    this OUTSIDE the differentiated train step (e.g. as a
    ``LocalTrainer.train(batch_transform=...)``): the raw
    ``[..., k, D]`` rows then never enter the fwd/bwd boundary — only the
    reduced ``[n_groups, D]`` block does.  Measured on the 62M-edge bench
    config this is worth +19% end-to-end (PERF.md "the frontier moved").

    The consuming conv's ``deferred_op`` must equal ``op`` and the hop's
    feature encoder must commute with the reduction (float-only affine
    encoders commute with mean/sum) — EgoGNN raises otherwise.
    """
    from graph_learn_tpu.ops.aggregate import gather_group_agg

    nodes = batch[alias]
    agg = gather_group_agg(table, nodes.ids, op=op)
    return {**batch,
            alias: nodes.replace(float_attrs=PreAggregatedRows(agg, op))}


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
                          hop_aliases: Sequence[str],
                          defer_last_table=None) -> "EgoGraph":
        """Build from a plan result.

        ``defer_last_table``: the deepest hop's [N, D] float-attr device
        table (e.g. ``query.device_tables()["nodes"][t].float_attrs``).
        When given, the deepest hop carries a :class:`DeferredRows`
        instead of materialised rows; inside a fused jitted step XLA
        dead-code-eliminates the plan's original gather, and EgoGNN
        aggregates from the table in sorted order.  Only worth it for
        FUSED sample+train steps on big feature tables.
        """
        src = result[src_alias]
        hops = [result[a] for a in hop_aliases]
        nbr_nums = tuple(h.ids.shape[-1] for h in hops)
        if defer_last_table is not None and hops:
            hops[-1] = hops[-1].replace(
                float_attrs=DeferredRows(table=defer_last_table,
                                         idx=hops[-1].ids))
        return cls(src=src, hops=list(hops), nbr_nums=nbr_nums)


@struct.dataclass
class TemporalGraph:
    """EgoGraph over a temporal event stream: hops carry edge time spans.

    Parity with the reference TemporalGraph
    (reference: graphlearn/python/nn/tf/data/temporalgraph.py:29-143 and
    dataset.get_temporalgraph, nn/tf/data/dataset.py:152-199): src nodes
    from the event endpoints, per-hop neighbor nodes + the edges leading to
    them, and time SPANS ``event_ts - edge_ts`` (so the store's ts rebasing
    cancels).  ``src_t`` is zeros (the src node is at the event time).
    """

    src: Nodes
    src_t: jax.Array                      # [b] float32 spans (zeros)
    nbr_nodes: List[Nodes] = struct.field(default_factory=list)
    nbr_t: List[jax.Array] = struct.field(default_factory=list)
    nbr_edges: List = struct.field(default_factory=list)  # Edges values
    nbr_nums: Sequence[int] = struct.field(pytree_node=False, default=())

    @property
    def batch_size(self) -> int:
        return self.src.ids.shape[0]

    def hop_node(self, i: int) -> Nodes:
        return self.nbr_nodes[i]

    def hop_edge(self, i: int):
        return self.nbr_edges[i]

    def hop_t(self, i: int) -> jax.Array:
        return self.nbr_t[i]

    @classmethod
    def from_query_result(cls, result: dict, src_alias: str,
                          edge_aliases: Sequence[str],
                          node_aliases: Sequence[str],
                          event_alias: str) -> "TemporalGraph":
        """Build from a GSL result of an ``g.E(temporal)`` event query.

        ``edge_aliases[i]`` is hop i's ``outE(...)`` alias (Edges with
        timestamps), ``node_aliases[i]`` its ``.inV()`` alias.
        """
        assert len(edge_aliases) == len(node_aliases)
        event = result[event_alias]
        event_ts = event.timestamps
        if event_ts is None:
            raise ValueError(
                "TemporalGraph needs a timestamped event root (g.E on a "
                "temporal edge type)")
        src = result[src_alias]
        src_t = jnp.zeros(src.ids.shape[0], jnp.float32)
        nbr_nodes, nbr_t, nbr_edges = [], [], []
        for ea, na in zip(edge_aliases, node_aliases):
            ev = result[ea]
            nbr_edges.append(ev)
            nbr_nodes.append(result[na])
            # span relative to the EVENT time, broadcast over the hop tree
            # (dataset.py:185-187)
            ts = ev.timestamps
            b = event_ts.shape[0]
            shape = (b,) + (1,) * (ts.ndim - 1)
            span = event_ts.reshape(shape).astype(jnp.float32) - \
                ts.astype(jnp.float32)
            nbr_t.append(span)
        nbr_nums = tuple(e.ids.shape[-1] for e in nbr_nodes)
        return cls(src=src, src_t=src_t, nbr_nodes=nbr_nodes, nbr_t=nbr_t,
                   nbr_edges=nbr_edges, nbr_nums=nbr_nums)
