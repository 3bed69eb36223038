"""SubGraph model stacks: SAGE / GCN / GAT over edge_index, link predictor.

Parity: reference nn/tf/model/{sage.py,gcn.py,gat.py} (conv stacks over
BatchGraph) and link_predictor.py (MLP scorer).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_learn_tpu.nn.layers.sub import GATConv, GCNConv, SAGEConv


class SubGraphStack(nn.Module):
    """Generic conv stack over (edge_index, x); act+dropout between layers."""

    convs: Sequence[nn.Module]
    act: Callable = nn.relu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, edge_index, x, edge_mask=None, training: bool = False,
                 **kwargs):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv(edge_index, h, edge_mask=edge_mask, **kwargs)
            if i < len(self.convs) - 1:
                h = self.act(h)
                if self.dropout:
                    h = nn.Dropout(self.dropout,
                                   deterministic=not training)(h)
        return h


def GraphSAGE(dims: Sequence[int], agg_type: str = "mean",
              act: Callable = nn.relu, dropout: float = 0.0,
              normalize: bool = False) -> SubGraphStack:
    convs = [SAGEConv(in_dim=dims[i], out_dim=dims[i + 1], agg_type=agg_type,
                      normalize=normalize, name="sage_%d" % i)
             for i in range(len(dims) - 1)]
    return SubGraphStack(convs=convs, act=act, dropout=dropout)


def GCN(dims: Sequence[int], act: Callable = nn.relu,
        dropout: float = 0.0) -> SubGraphStack:
    convs = [GCNConv(in_dim=dims[i], out_dim=dims[i + 1], name="gcn_%d" % i)
             for i in range(len(dims) - 1)]
    return SubGraphStack(convs=convs, act=act, dropout=dropout)


def GAT(dims: Sequence[int], num_heads: int = 1, attn_dropout: float = 0.0,
        act: Callable = nn.relu, dropout: float = 0.0) -> SubGraphStack:
    convs = [GATConv(in_dim=dims[i], out_dim=dims[i + 1],
                     num_heads=num_heads, attn_dropout=attn_dropout,
                     name="gat_%d" % i)
             for i in range(len(dims) - 1)]
    return SubGraphStack(convs=convs, act=act, dropout=dropout)


class LinkPredictor(nn.Module):
    """MLP edge scorer (reference nn/tf/model/link_predictor.py)."""

    hidden_dim: int
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, src_emb, dst_emb, training: bool = False):
        h = src_emb * dst_emb
        for i in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden_dim, name="mlp_%d" % i)(h))
            if self.dropout:
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(1, name="out")(h)[..., 0]
