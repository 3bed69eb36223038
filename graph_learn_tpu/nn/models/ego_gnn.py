"""EgoGNN: hop-list folding over EgoLayers + concrete model classes.

Parity with the reference
(reference: graphlearn/python/nn/tf/model/ego_gnn.py:32-110 folding;
examples/tf/ego_sage/ego_sage.py:30-66, ego_gat/ego_gat.py,
ego_rgcn/ego_rgcn.py model constructions with per-level parameter sharing).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.values import Nodes
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.nn.data import (DeferredRows, EgoGraph,
                                     PreAggregatedRows)
from graph_learn_tpu.nn.feature_column import FeatureEncoder
from graph_learn_tpu.nn.layers.ego import (EgoGATConv, EgoGINConv, EgoLayer,
                                           EgoRGCNConv, EgoSAGEConv)


def _encoder_commutes(enc, op: str) -> bool:
    """Does ``enc(group_agg(rows)) == group_agg(enc(rows))``?

    FeatureEncoder over a float-only decoder is a cast (identity) or a
    cast + Dense projection.  mean commutes with any affine map;
    sum/max additionally require the pure passthrough (Dense bias breaks
    sum — enc(sum) = W·sum + b vs sum(enc) = W·sum + k·b — and any Dense
    breaks max).  Anything fancier (int-attr embeddings, custom modules)
    falls back to materialising the hop.
    """
    if not isinstance(enc, FeatureEncoder):
        return False
    d = enc.decoder
    if d.int_attr_num or d.multival_attr_num:
        return False
    if op == "mean":
        return True
    return enc.output_dim is None


class EgoGNN(nn.Module):
    """Fold K+1 hop tensors through EgoLayers (ego_gnn.py:58-110).

    ``encoders``: one FeatureEncoder per hop position (index 0 = src);
    pass the same instance to share.  Hidden activations get act/dropout
    between levels, none after the last.
    """

    layers: Sequence[EgoLayer]
    encoder: Optional[nn.Module] = None  # shared homo encoder
    hop_encoders: Optional[Sequence[nn.Module]] = None  # hetero per-hop
    act: Callable = nn.relu
    dropout: float = 0.0

    def _enc_for(self, i: int):
        return (self.hop_encoders[i] if self.hop_encoders is not None
                else self.encoder)

    def _prepare(self, ego: EgoGraph):
        """Split into (values to encode, deep_agg) handling deferral.

        A deepest hop carrying :class:`DeferredRows` is either aggregated
        straight from the table (sorted segment gather — the whole point)
        when the consuming conv supports pre-aggregated neighbors and the
        encoder commutes with its reduction, or materialised and treated
        exactly as before.
        """
        values = [ego.src] + list(ego.hops)
        fa = ego.hops[-1].float_attrs if ego.hops else None
        if not isinstance(fa, (DeferredRows, PreAggregatedRows)):
            return values, None
        conv = self.layers[0].convs[-1]
        op = getattr(conv, "deferred_op", None)
        enc = self._enc_for(len(values) - 1)
        if isinstance(fa, PreAggregatedRows):
            # grouped-prefetch path: raw rows were never materialised, so
            # the reduction must match and the encoder must commute
            if op != fa.op or not _encoder_commutes(enc, op):
                raise InvalidArgumentError(
                    "PreAggregatedRows(op=%r) cannot feed %s (deferred_op="
                    "%r, encoder commutes=%s) — pre-aggregate with the "
                    "conv's op and a float-only affine encoder"
                    % (fa.op, type(conv).__name__, op,
                       _encoder_commutes(enc, op) if op else "-"))
            agg_raw = fa.agg
        elif op is None or not _encoder_commutes(enc, op):
            values[-1] = ego.hops[-1].replace(float_attrs=fa.materialize())
            return values, None
        else:
            agg_raw = fa.group_agg(op)  # [n_prev_flat, D_raw]
        deep_agg = enc(Nodes(ids=jnp.zeros((agg_raw.shape[0],), jnp.int32),
                             float_attrs=agg_raw,
                             type_name=ego.hops[-1].type_name))
        return values[:-1], deep_agg

    @nn.compact
    def __call__(self, ego: EgoGraph, training: bool = False):
        values, deep_agg = self._prepare(ego)
        h = [self._enc_for(i)(v) for i, v in enumerate(values)]
        hops = list(ego.nbr_nums)
        n_layers = len(self.layers)
        for i in range(n_layers - 1):
            current = hops if i == 0 else hops[:len(hops) - i]
            h = self.layers[i](h, current,
                               deep_agg=deep_agg if i == 0 else None)
            out = []
            for x in h:
                x = self.act(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout,
                                   deterministic=not training)(x)
                out.append(x)
            h = out
        h = self.layers[-1](h, [hops[0]],
                            deep_agg=deep_agg if n_layers == 1 else None)
        assert len(h) == 1
        return h[0]


def EgoGraphSAGE(dims: Sequence[int], decoder: Decoder,
                 agg_type: str = "gcn", act: Callable = nn.relu,
                 dropout: float = 0.0) -> EgoGNN:
    """dims[0] must equal the encoder output dim (features_num for Cora)."""
    layers = []
    for i in range(len(dims) - 1):
        conv = EgoSAGEConv(in_dim=dims[i], out_dim=dims[i + 1],
                           agg_type=agg_type, name="sage_%d" % i)
        layers.append(EgoLayer(convs=[conv] * (len(dims) - 1 - i),
                               name="layer_%d" % i))
    return EgoGNN(layers=layers, encoder=FeatureEncoder(decoder),
                  act=act, dropout=dropout)


def EgoGAT(dims: Sequence[int], decoder: Decoder,
           num_heads: Optional[Sequence[int]] = None,
           attn_dropout: float = 0.0, act: Callable = nn.relu,
           dropout: float = 0.0, seed_chunk: Optional[int] = None) -> EgoGNN:
    layers = []
    for i in range(len(dims) - 1):
        conv = EgoGATConv(in_dim=dims[i], out_dim=dims[i + 1],
                          num_head=(num_heads[i] if num_heads else 1),
                          attn_dropout=attn_dropout, name="gat_%d" % i,
                          **({} if seed_chunk is None
                             else {"seed_chunk": seed_chunk}))
        layers.append(EgoLayer(convs=[conv] * (len(dims) - 1 - i),
                               name="layer_%d" % i))
    return EgoGNN(layers=layers, encoder=FeatureEncoder(decoder),
                  act=act, dropout=dropout)


def EgoGIN(dims: Sequence[int], decoder: Decoder, eps: float = 0.0,
           act: Callable = nn.relu, dropout: float = 0.0) -> EgoGNN:
    layers = []
    for i in range(len(dims) - 1):
        conv = EgoGINConv(in_dim=dims[i], out_dim=dims[i + 1], eps=eps,
                          name="gin_%d" % i)
        layers.append(EgoLayer(convs=[conv] * (len(dims) - 1 - i),
                               name="layer_%d" % i))
    return EgoGNN(layers=layers, encoder=FeatureEncoder(decoder),
                  act=act, dropout=dropout)


class EgoRGCN(nn.Module):
    """Multi-relation EgoGNN (reference examples/tf/ego_rgcn/ego_rgcn.py).

    The EgoGraph here carries hops from R relations per level: hop layout
    follows the reference data loader — level l has R^l groups of
    per-relation hop tensors.  For the common 2-relation 2-hop case the
    hop aliases order is [r0_h1, r1_h1, r0r0_h2, r0r1_h2, r1r0_h2, r1r1_h2].
    """

    dims: Sequence[int]
    decoder: Decoder
    num_relations: int
    num_bases: Optional[int] = None
    num_blocks: Optional[int] = None
    agg_type: str = "mean"
    act: Callable = nn.relu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, ego: EgoGraph, training: bool = False):
        R = self.num_relations
        enc = FeatureEncoder(self.decoder)
        values = [ego.src] + list(ego.hops)
        K = len(self.dims) - 1

        # deferred deepest level (same contract as EgoGNN._prepare): when
        # every deepest-level hop carries DeferredRows/PreAggregatedRows,
        # consume the per-group reductions straight from the table — the
        # raw [*, kK, D] rows never enter the fwd/bwd boundary (the lever
        # that set the EgoSAGE frontier record, PERF.md r3).
        n_deep = R ** K
        deep_vals, deep_aggs = values[-n_deep:], None
        if all(isinstance(v.float_attrs, (DeferredRows, PreAggregatedRows))
               for v in deep_vals):
            op = self.agg_type
            commute = _encoder_commutes(enc, op)
            pre = [v for v in deep_vals
                   if isinstance(v.float_attrs, PreAggregatedRows)]
            if pre and (not commute or any(v.float_attrs.op != op
                                           for v in pre)):
                raise InvalidArgumentError(
                    "PreAggregatedRows cannot feed EgoRGCN (agg_type=%r, "
                    "encoder commutes=%s) — pre-aggregate with the conv's "
                    "op and a float-only affine encoder" % (op, commute))
            if commute:
                deep_aggs = []
                for v in deep_vals:
                    fa = v.float_attrs
                    agg_raw = (fa.agg if isinstance(fa, PreAggregatedRows)
                               else fa.group_agg(op))
                    deep_aggs.append(enc(Nodes(
                        ids=jnp.zeros((agg_raw.shape[0],), jnp.int32),
                        float_attrs=agg_raw, type_name=v.type_name)))
                values = values[:-n_deep]
            else:
                values = values[:-n_deep] + [
                    v.replace(float_attrs=v.float_attrs.materialize())
                    for v in deep_vals]

        h = [enc(v) for v in values]
        # group flat hop list into levels: level l has R^l tensors
        levels: List[List[jax.Array]] = [[h[0]]]
        idx = 1
        for l in range(1, K + 1 - (deep_aggs is not None)):
            cnt = R ** l
            levels.append(h[idx:idx + cnt])
            idx += cnt
        expands = list(ego.nbr_nums)  # per-level fanouts [k1, ..., kK]

        for i in range(K):
            conv = EgoRGCNConv(in_dim=self.dims[i], out_dim=self.dims[i + 1],
                               num_relations=R, num_bases=self.num_bases,
                               num_blocks=self.num_blocks,
                               agg_type=self.agg_type, name="rgcn_%d" % i)
            new_levels = []
            for l in range(K - i):
                outs = []
                for g in range(R ** l):
                    x = levels[l][g]
                    if i == 0 and deep_aggs is not None and l == K - 1:
                        outs.append(conv(
                            x, None, expands[l],
                            neighbors_agg=[deep_aggs[g * R + r]
                                           for r in range(R)]))
                    else:
                        nbrs = [levels[l + 1][g * R + r] for r in range(R)]
                        outs.append(conv(x, nbrs, expands[l]))
                new_levels.append(outs)
            levels = new_levels
            if i < K - 1:
                levels = [[
                    nn.Dropout(self.dropout, deterministic=not training)(
                        self.act(x)) if self.dropout else self.act(x)
                    for x in lv] for lv in levels]
        return levels[0][0]
