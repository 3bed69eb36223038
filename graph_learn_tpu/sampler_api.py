"""Non-GSL sampler objects: the reference's pre-GSL request-per-call API.

Parity with graphlearn/python/sampler/*.py (784 LoC, one class per
strategy) and the factory methods on Graph
(reference: python/graph.py node_sampler:788, edge_sampler:831,
neighbor_sampler:863, negative_sampler:894, subgraph_sampler:1059):
``s = g.neighbor_sampler(edge_type, k, strategy); s.get(ids)``.

Each call is a jitted device op over raw ids; results are the same value
structs GSL produces.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Mask, mask_type
from graph_learn_tpu.core.traversal import Traverser
from graph_learn_tpu.core.values import Edges, Nodes, SparseNodes
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.ops import negative as neg_ops
from graph_learn_tpu.ops import sampling as samp_ops
from graph_learn_tpu.ops import subgraph as sg_ops
from graph_learn_tpu.ops import walk as walk_ops
from graph_learn_tpu.ops.lookup import (lookup_nodes, lookup_sparse_nodes)


class _Base:
    def __init__(self, graph, seed: Optional[int] = None):
        self.graph = graph
        self._key = jax.random.key(conf.seed if seed is None else seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub


class NodeSampler(_Base):
    """Traverse a node set (reference sampler/node_sampler.py)."""

    def __init__(self, graph, node_type: str, batch_size: int = 64,
                 strategy: str = "by_order", mask=Mask.NONE, seed=None):
        super().__init__(graph, seed)
        typed = mask_type(node_type, mask)
        self.node_set = graph.store.node_set(typed)
        self.base_type = self.node_set.base_type
        self._trav = Traverser(self.node_set.size, batch_size,
                               strategy=("shuffle" if strategy == "shuffle"
                                         else "random" if strategy == "random"
                                         else "by_order"),
                               seed=conf.seed if seed is None else seed)

    def get(self) -> Nodes:
        pos, count = self._trav.next()
        idx = jnp.asarray(self.node_set.indices[pos], jnp.int32)
        t = self.graph.store.node_table(self.base_type).device()
        return lookup_nodes(t, idx, type_name=self.base_type)


class EdgeSampler(_Base):
    """Traverse an edge table (reference sampler/edge_sampler.py)."""

    def __init__(self, graph, edge_type: str, batch_size: int = 64,
                 strategy: str = "by_order", seed=None):
        super().__init__(graph, seed)
        self.edge_type = edge_type
        self.et = graph.store.edge_table(edge_type)
        self._trav = Traverser(self.et.num_edges, batch_size,
                               strategy=("shuffle" if strategy == "shuffle"
                                         else "random" if strategy == "random"
                                         else "by_order"),
                               seed=conf.seed if seed is None else seed)

    def get(self) -> Edges:
        pos, count = self._trav.next()
        eidx = jnp.asarray(pos, jnp.int32)
        dev = self.et.device()
        s_t, d_t = self.et.src_type, self.et.dst_type
        from graph_learn_tpu.ops.lookup import edge_payload
        pay = edge_payload(dev, eidx)
        src = lookup_nodes(self.graph.store.node_table(s_t).device(),
                           dev.src[eidx], type_name=s_t)
        dst = lookup_nodes(self.graph.store.node_table(d_t).device(),
                           dev.dst[eidx], type_name=d_t)
        return Edges(edge_ids=eidx, src_nodes=src, dst_nodes=dst,
                     weights=pay["weights"], labels=pay["labels"],
                     timestamps=pay["timestamps"],
                     int_attrs=pay["int_attrs"],
                     float_attrs=pay["float_attrs"],
                     multival_attrs=pay["multival_attrs"],
                     multival_lens=pay["multival_lens"],
                     type_name=self.edge_type)


class NeighborSampler(_Base):
    """Fixed-fanout neighbor sampling (reference sampler/neighbor_sampler.py).

    ``get(ids)`` takes RAW node ids and returns per-hop Nodes (dense) or
    SparseNodes ('full').
    """

    def __init__(self, graph, edge_type: str,
                 expand_factor: Union[int, Sequence[int]],
                 strategy: str = "random", seed=None):
        super().__init__(graph, seed)
        self.edge_type = edge_type
        self.fanouts = ([expand_factor] if isinstance(expand_factor, int)
                        else list(expand_factor))
        self.strategy = strategy
        self.et = graph.store.edge_table(edge_type)

    def get(self, ids: np.ndarray):
        s_t, d_t = self.et.src_type, self.et.dst_type
        src_tab = self.graph.store.node_table(s_t)
        idx = jnp.asarray(src_tab.index.lookup(np.asarray(ids, np.int64)),
                          jnp.int32)
        dev = self.et.device()
        dst_dev = self.graph.store.node_table(d_t).device()
        out = []
        cur = idx
        for k in self.fanouts:
            key = self._next_key()
            flat = cur.reshape(-1)
            if self.strategy == "full":
                cap = k if k > 0 else conf.default_full_nbr_num
                nbr, eids, degs = samp_ops.full_sample(dev.out, flat, cap)
                out.append(lookup_sparse_nodes(dst_dev, nbr, degs,
                                               type_name=d_t))
                cur = nbr
                continue
            if self.strategy == "random":
                nbr, eids = samp_ops.uniform_sample(dev.out, flat, k, key)
            elif self.strategy == "topk":
                nbr, eids = samp_ops.topk_sample(dev.out, flat, k)
            elif self.strategy in ("edge_weight", "in_degree"):
                nbr, eids = samp_ops.weighted_sample(dev.out, flat, k, key,
                                                     by=self.strategy)
            elif self.strategy == "random_without_replacement":
                nbr, eids = samp_ops.without_replacement_sample(
                    dev.out, flat, k, key)
            else:
                raise InvalidArgumentError("strategy %r" % self.strategy)
            nbr = nbr.reshape(cur.shape + (k,))
            out.append(lookup_nodes(dst_dev, nbr, type_name=d_t))
            cur = nbr
        return out


class NegativeSampler(_Base):
    """reference sampler/negative_sampler.py."""

    def __init__(self, graph, object_type: str, expand_factor: int,
                 strategy: str = "random", seed=None):
        super().__init__(graph, seed)
        # object_type may be an edge type (topology-aware negatives) or a
        # node type (pool = the node set, NodeFrom.NODE parity)
        self.nt = None
        if object_type in graph.store.edges:
            self.et = graph.store.edge_table(object_type)
        else:
            self.et = None
            self.nt = object_type
        self.k = expand_factor
        self.strategy = strategy

    def get(self, ids: np.ndarray) -> Nodes:
        if self.nt is not None:
            tab = self.graph.store.node_table(self.nt)
            dev = tab.device()
            neg = neg_ops.negative_sample_from_nodes(
                dev, len(ids), self.k, self._next_key(),
                strategy=self.strategy)
            return lookup_nodes(dev, neg, type_name=self.nt)
        s_t, d_t = self.et.src_type, self.et.dst_type
        src_tab = self.graph.store.node_table(s_t)
        idx = jnp.asarray(src_tab.index.lookup(np.asarray(ids, np.int64)),
                          jnp.int32)
        dev = self.et.device()
        dst_dev = self.graph.store.node_table(d_t).device()
        neg = neg_ops.negative_sample(dev, idx, self.k, self._next_key(),
                                      strategy=self.strategy,
                                      dst_table=dst_dev)
        return lookup_nodes(dst_dev, neg, type_name=d_t)


class SubGraphSampler(_Base):
    """reference sampler/subgraph_sampler.py / graph.py:1059."""

    def __init__(self, graph, seed_type: str, nbr_type: str,
                 num_nbrs: Sequence[int] = (0,), need_dist: bool = False,
                 seed=None):
        super().__init__(graph, seed)
        self.et = graph.store.edge_table(nbr_type)
        self.seed_type = seed_type
        self.need_dist = need_dist
        self.cap = (num_nbrs[0] if num_nbrs and num_nbrs[0] > 0
                    else conf.default_full_nbr_num)

    def get(self, ids: np.ndarray):
        s_t = self.et.src_type
        tab = self.graph.store.node_table(s_t)
        idx = jnp.asarray(tab.index.lookup(np.asarray(ids, np.int64)),
                          jnp.int32)
        dev = self.et.device()
        sg = sg_ops.induce_subgraph(dev.out, idx, nbr_cap=self.cap,
                                    need_dist=self.need_dist)
        nodes = lookup_nodes(tab.device(),
                             jnp.where(sg.node_ids < jnp.int32(2**31 - 1),
                                       sg.node_ids, 0), type_name=s_t)
        return sg.replace(nodes=nodes)


class RandomWalkSampler(_Base):
    """reference random_walk GSL node / node2vec walks."""

    def __init__(self, graph, edge_type: str, walk_len: int,
                 p: float = 1.0, q: float = 1.0, seed=None):
        super().__init__(graph, seed)
        self.et = graph.store.edge_table(edge_type)
        self.walk_len = walk_len
        self.p, self.q = p, q

    def get(self, ids: np.ndarray) -> jax.Array:
        s_t = self.et.src_type
        tab = self.graph.store.node_table(s_t)
        idx = jnp.asarray(tab.index.lookup(np.asarray(ids, np.int64)),
                          jnp.int32)
        return walk_ops.node2vec_walk(self.et.device().out, idx,
                                      self.walk_len, self._next_key(),
                                      p=self.p, q=self.q)


def install_factories():
    """Attach g.node_sampler()/edge_sampler()/... to Graph (graph.py:788+)."""
    from graph_learn_tpu.graph import Graph

    def node_sampler(self, t, batch_size=64, strategy="by_order",
                     mask=Mask.NONE, seed=None):
        return NodeSampler(self, t, batch_size, strategy, mask, seed)

    def edge_sampler(self, edge_type, batch_size=64, strategy="by_order",
                     seed=None):
        return EdgeSampler(self, edge_type, batch_size, strategy, seed)

    def neighbor_sampler(self, meta_path, expand_factor, strategy="random",
                         seed=None):
        et = meta_path[0] if isinstance(meta_path, (list, tuple)) else meta_path
        return NeighborSampler(self, et, expand_factor, strategy, seed)

    def negative_sampler(self, object_type, expand_factor, strategy="random",
                         seed=None):
        return NegativeSampler(self, object_type, expand_factor, strategy,
                               seed)

    def subgraph_sampler(self, seed_type, nbr_type, num_nbrs=(0,),
                         need_dist=False, seed=None):
        return SubGraphSampler(self, seed_type, nbr_type, num_nbrs,
                               need_dist, seed)

    def random_walk_sampler(self, edge_type, walk_len, p=1.0, q=1.0,
                            seed=None):
        return RandomWalkSampler(self, edge_type, walk_len, p, q, seed)

    Graph.node_sampler = node_sampler
    Graph.edge_sampler = edge_sampler
    Graph.neighbor_sampler = neighbor_sampler
    Graph.negative_sampler = negative_sampler
    Graph.subgraph_sampler = subgraph_sampler
    Graph.random_walk_sampler = random_walk_sampler


install_factories()
