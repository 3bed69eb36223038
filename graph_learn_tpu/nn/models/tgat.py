"""EgoTGAT: temporal graph attention over TemporalGraph hop lists.

Parity with the reference TGAT example
(reference: graphlearn/examples/tf/ego_tgat/ego_tgat.py:31-146 EgoTGAT /
ConvLayer / MergeLayer / LinkScorePredict; TimeEncoder in
nn/tf/data/temporalgraph.py:145-163): Bochner time encoding
``cos(t * basis_freq + phase)`` with ``basis_freq`` initialised to
``1/10**linspace(0,9,time_dim)``; each level's GAT conv attends over
``[node_feat ++ edge_feat ++ time_emb]`` of the neighbors with the centric
node's ``[feat ++ time_emb]`` as the query.

TPU notes: everything stays dense ``[b*prod(k), d]`` — the hop tree is
folded exactly like EgoGNN, so each level is one batched MXU matmul + a
softmax over the expand axis.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_learn_tpu.nn.data import TemporalGraph
from graph_learn_tpu.nn.layers.ego import EgoGATConv


class TimeEncoder(nn.Module):
    """Bochner-feature time-span encoding (temporalgraph.py:145-163)."""

    time_dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        freq0 = (1.0 / 10 ** np.linspace(0, 9, self.time_dim)).astype(
            np.float32)
        basis_freq = self.param("basis_freq", lambda key: jnp.asarray(freq0))
        phase = self.param("phase", nn.initializers.uniform(1.0),
                           (self.time_dim,))
        ts = t.astype(jnp.float32).reshape(-1)[:, None]  # [N, 1]
        return jnp.cos(ts * basis_freq[None, :] + phase[None, :])


class EgoTGAT(nn.Module):
    """TGAT over a TemporalGraph (ego_tgat.py:31-97).

    ``encoders``: K+1 feature encoders (src + one per hop's node type);
    ``edge_encoders``: K encoders for hop edge features (None entries fall
    back to raw float attrs).  Convs share params across hop pairs within
    a level, like the reference ``ConvLayer([conv] * n)``.
    """

    hidden_dim: int
    out_dim: int
    time_dim: int
    num_hops: int
    encoders: Sequence[nn.Module]
    edge_encoders: Optional[Sequence[Optional[nn.Module]]] = None
    num_head: int = 1
    attn_dropout: float = 0.0
    act: Callable = nn.relu
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tg: TemporalGraph, training: bool = False):
        K = self.num_hops
        assert len(tg.nbr_nodes) == K and len(self.encoders) == K + 1
        time_enc = TimeEncoder(self.time_dim, name="time_encoder")

        # h^0: [feat, time_emb] per level, flattened [b*prod(k), d]
        src = self.encoders[0](tg.src)
        h = [[src, time_enc(tg.src_t)]]
        for i in range(K):
            n_feat = self.encoders[i + 1](tg.nbr_nodes[i])
            ev = tg.nbr_edges[i]
            if self.edge_encoders is not None and \
                    self.edge_encoders[i] is not None:
                e_feat = self.edge_encoders[i](ev)
            else:
                fa = ev.float_attrs
                e_feat = (fa.reshape((-1, fa.shape[-1]))
                          if fa is not None else None)
            t_emb = time_enc(tg.nbr_t[i])
            parts = [n_feat] + ([e_feat] if e_feat is not None else []) \
                + [t_emb]
            h.append(parts)

        hops = list(tg.nbr_nums)
        for lvl in range(K):
            out_dim = self.out_dim if lvl == K - 1 else self.hidden_dim
            # level 0 mixes [feat++time] queries with [feat++edge++time]
            # keys (hetero projections); later levels are homo
            # hidden+time on both sides (train_eval.py:131-137 dims)
            in_dim = (1, 2) if lvl == 0 else self.hidden_dim + self.time_dim
            conv = EgoGATConv(in_dim=in_dim, out_dim=out_dim,
                              num_head=self.num_head,
                              attn_dropout=self.attn_dropout,
                              name="tgat_conv_%d" % lvl)
            current = hops if lvl == 0 else hops[:len(hops) - lvl]
            new_h = []
            for i in range(1, len(h)):
                x = jnp.concatenate([h[i - 1][0], h[i - 1][-1]], axis=-1)
                nbr = jnp.concatenate(h[i], axis=-1)
                new_h.append(conv(x, nbr, current[i - 1],
                                  training=training))
            if lvl == K - 1:
                assert len(new_h) == 1
                return new_h[0]
            folded = []
            for idx, x in enumerate(new_h):
                x = self.act(x)
                if self.dropout:
                    x = nn.Dropout(self.dropout,
                                   deterministic=not training)(x)
                t_emb = (time_enc(tg.src_t) if idx == 0
                         else time_enc(tg.nbr_t[idx - 1]))
                folded.append([x, t_emb])
            h = folded
        raise AssertionError("unreachable")


class MergeLayer(nn.Module):
    """2-layer MLP over concatenated embeddings (ego_tgat.py:99-121)."""

    hidden_dim: int
    out_dim: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        x = nn.Dense(self.hidden_dim, name="merge_layer1")(x)
        x = self.act(x)
        return nn.Dense(self.out_dim, name="merge_layer2")(x)


class LinkScorePredict(nn.Module):
    """Affinity scores for (src, pos_dst) and (src, neg_dst)
    (ego_tgat.py:138-146)."""

    feat_dim: int

    @nn.compact
    def __call__(self, src_emb, pos_dst_emb, neg_dst_emb):
        score = MergeLayer(self.feat_dim, 1, name="affinity_score")
        pos = jnp.squeeze(score(src_emb, pos_dst_emb), axis=-1)
        neg = jnp.squeeze(score(src_emb, neg_dst_emb), axis=-1)
        return pos, neg
