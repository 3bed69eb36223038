"""SubGraph (edge_index) convolution layers: SAGE / GCN / GAT / Hetero.

Math parity with the reference sub convs (segment ops over edge_index):

- SAGEConv: reference nn/tf/layers/sage_conv.py:59-90 — gather src msgs,
  unsorted_segment_{sum,mean} onto dst (edge_index[1]), separate
  self/neigh weights; 'gcn' drops the self path.
- GCNConv: gcn_conv.py:48-80 — W x, symmetric-ish degree norm with added
  self-loops, segment_sum along edge_index[0].
- GATConv: gat_conv.py:40-120 — per-head linear, src/dst attention terms
  added, leaky_relu, segment softmax over edge_index[0], weighted
  segment_sum; concat or mean heads.  Self-loops appended.

TPU shape-static adaptation: edge_index comes with a validity mask
(padded slots from the cap-based induction, ops/subgraph.py); masked
messages contribute zero / -inf (softmax).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_learn_tpu.ops.segment import segment_softmax


def _masked(vals, mask):
    return vals if mask is None else jnp.where(mask[:, None], vals, 0.0)


def _seg_sum(vals, seg, n, mask=None):
    return jax.ops.segment_sum(_masked(vals, mask), seg, num_segments=n)


def _seg_mean(vals, seg, n, mask=None):
    s = _seg_sum(vals, seg, n, mask)
    ones = jnp.ones((vals.shape[0],), vals.dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=n)
    return s / jnp.maximum(cnt, 1.0)[:, None]


class SAGEConv(nn.Module):
    in_dim: Union[int, Tuple[int, int]]
    out_dim: int
    agg_type: str = "mean"  # mean | sum | gcn
    normalize: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, edge_index, node_vec, edge_mask=None):
        if not isinstance(node_vec, (tuple, list)):
            node_vec = (node_vec, node_vec)
        n_dst = node_vec[1].shape[0]
        msgs = node_vec[0][edge_index[0]]
        if self.agg_type in ("sum", "gcn"):
            agg = _seg_sum(msgs, edge_index[1], n_dst, edge_mask)
        elif self.agg_type == "mean":
            agg = _seg_mean(msgs, edge_index[1], n_dst, edge_mask)
        else:
            raise ValueError("unsupported agg_type %r" % self.agg_type)
        from_neighs = nn.Dense(self.out_dim, use_bias=False,
                               name="neigh_weights")(agg)
        if self.agg_type == "gcn":
            out = from_neighs
        else:
            out = from_neighs + nn.Dense(self.out_dim, use_bias=False,
                                         name="self_weights")(node_vec[1])
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_dim,))
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out


class GCNConv(nn.Module):
    in_dim: int
    out_dim: int
    normalize: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, edge_index, node_vec, edge_mask=None):
        n = node_vec.shape[0]
        # append self-loops (gcn_conv.py:49-56); self-loops are always valid
        diag = jnp.stack([jnp.arange(n, dtype=jnp.int32)] * 2, axis=0)
        ei = jnp.concatenate([edge_index, diag], axis=1)
        if edge_mask is not None:
            mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        else:
            mask = None
        h = nn.Dense(self.out_dim, use_bias=False, name="weights")(node_vec)
        if self.normalize:
            w = jnp.ones((ei.shape[1],), h.dtype)
            if mask is not None:
                w = jnp.where(mask, w, 0.0)
            deg = jax.ops.segment_sum(w, ei[0], num_segments=n)
            dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                             0.0)
            h = h * dinv[:, None]
        msgs = h[ei[1]]
        out = _seg_sum(msgs, ei[0], n, mask)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_dim,))
        return out


class GATConv(nn.Module):
    in_dim: int
    out_dim: int
    num_heads: int = 1
    concat: bool = False
    attn_dropout: float = 0.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, edge_index, node_vec, edge_mask=None,
                 training: bool = False):
        n = node_vec.shape[0]
        H, D = self.num_heads, self.out_dim
        diag = jnp.stack([jnp.arange(n, dtype=jnp.int32)] * 2, axis=0)
        ei = jnp.concatenate([edge_index, diag], axis=1)
        mask = None
        if edge_mask is not None:
            mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        h = nn.Dense(H * D, use_bias=False, name="w")(node_vec)
        h = h.reshape((-1, H, D))
        a_src = self.param("attn_src", nn.initializers.lecun_normal(),
                           (1, H, D))
        a_dst = self.param("attn_dst", nn.initializers.lecun_normal(),
                           (1, H, D))
        src_e = jnp.sum(h * a_src, axis=-1)  # [n, H]
        dst_e = jnp.sum(h * a_dst, axis=-1)
        # TF leaky_relu default alpha 0.2 (reference gat_conv.py:102)
        e = nn.leaky_relu(src_e[ei[0]] + dst_e[ei[1]], 0.2)  # [E, H]
        m = None if mask is None else mask[:, None] & jnp.ones_like(e, bool)
        alpha = segment_softmax(e, ei[0], n, mask=m)
        if self.attn_dropout and training:
            alpha = nn.Dropout(self.attn_dropout, deterministic=False)(alpha)
        msgs = h[ei[1]] * alpha[..., None]  # [E, H, D]
        if mask is not None:
            msgs = jnp.where(mask[:, None, None], msgs, 0.0)
        out = jax.ops.segment_sum(msgs, ei[0], num_segments=n)  # [n, H, D]
        if self.concat:
            out = out.reshape((-1, H * D))
        else:
            out = jnp.mean(out, axis=1)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (out.shape[-1],))
        return out


class HeteroConv(nn.Module):
    """Per-edge-type conv dispatch with dst-wise sum combine.

    Parity: reference nn/tf/layers/hetero_conv.py — one conv per edge
    type over a hetero BatchGraph; outputs summed per dst node type.
    """

    convs: dict  # edge_type -> conv module

    def __call__(self, edge_indices: dict, node_vecs: dict,
                 topology: dict, edge_masks: Optional[dict] = None,
                 **kwargs):
        """edge_indices[et] = [2, E]; topology[et] = (src_t, dst_t)."""
        out = {}
        for et, conv in self.convs.items():
            s_t, d_t = topology[et]
            ei = edge_indices[et]
            em = (edge_masks or {}).get(et)
            vec = (node_vecs[s_t], node_vecs[d_t])
            if s_t == d_t:
                vec = node_vecs[s_t]
            res = conv(ei, vec, edge_mask=em, **kwargs)
            out[d_t] = out.get(d_t, 0) + res
        return out
