"""Losses: the reference quartet.

Parity: graphlearn/python/nn/tf/loss.py:28-93 (sigmoid CE, in-batch
unsupervised softmax CE, triplet margin, triplet softplus) plus the
supervised softmax CE used by examples (train_supervised.py:83-90).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def supervised_softmax_loss(logits: jax.Array, labels: jax.Array,
                            valid: jax.Array | None = None) -> jax.Array:
    ls = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if valid is not None:
        w = valid.astype(ls.dtype)
        return jnp.sum(ls * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(ls)


def sigmoid_cross_entropy_loss(pos_logit: jax.Array,
                               neg_logit: jax.Array) -> jax.Array:
    """loss.py:28-42: mean BCE(pos, 1) + mean BCE(neg, 0)."""
    pos = optax.sigmoid_binary_cross_entropy(pos_logit,
                                             jnp.ones_like(pos_logit))
    neg = optax.sigmoid_binary_cross_entropy(neg_logit,
                                             jnp.zeros_like(neg_logit))
    return jnp.mean(pos) + jnp.mean(neg)


def unsupervised_softmax_cross_entropy_loss(src_emb: jax.Array,
                                            pos_emb: jax.Array,
                                            neg_emb: jax.Array,
                                            temperature: float = 1.0) -> jax.Array:
    """loss.py:44-63: pos sim vs [b, neg] in-batch matmul sims."""
    pos_sim = jnp.sum(src_emb * pos_emb, axis=-1, keepdims=True)
    neg_sim = src_emb @ neg_emb.T
    logit = jax.nn.softmax(
        jnp.concatenate([pos_sim, neg_sim], axis=-1) / temperature)
    return -jnp.mean(jnp.log(logit[:, :1] + 1e-12))


def triplet_margin_loss(pos_src_emb, pos_edge_emb, pos_dst_emb,
                        neg_src_emb, neg_edge_emb, neg_dst_emb,
                        margin: float, neg_num: int, L: int = 1) -> jax.Array:
    """loss.py:66-88 (TransE)."""
    if L == 2:
        pos_d = jnp.sum(jnp.square(pos_src_emb + pos_edge_emb - pos_dst_emb), -1)
        neg_d = jnp.sum(jnp.square(neg_src_emb + neg_edge_emb - neg_dst_emb), -1)
    else:
        pos_d = jnp.sum(jnp.abs(pos_src_emb + pos_edge_emb - pos_dst_emb), -1)
        neg_d = jnp.sum(jnp.abs(neg_src_emb + neg_edge_emb - neg_dst_emb), -1)
    if neg_num > 1:
        pos_d = jnp.repeat(pos_d[:, None], neg_num, axis=1).reshape(-1)
    return jnp.mean(jnp.maximum(0.0, margin + pos_d - neg_d))


def triplet_softplus_loss(pos_src_emb, pos_edge_emb, pos_dst_emb,
                          neg_src_emb, neg_edge_emb, neg_dst_emb) -> jax.Array:
    """loss.py:90-... (DistMult)."""
    pos_s = jnp.sum(pos_src_emb * pos_edge_emb * pos_dst_emb, -1)
    neg_s = jnp.sum(neg_src_emb * neg_edge_emb * neg_dst_emb, -1)
    return jnp.mean(jax.nn.softplus(-pos_s)) + jnp.mean(jax.nn.softplus(neg_s))
