"""Server-side-style aggregation ops: segment reduce of node float attrs.

Parity with the reference aggregator operators
(reference: graphlearn/src/core/operator/aggregator/aggregator.cc:31-60,
{sum,mean,max,min,prod}_aggregator.cc; exposed as ``Nodes.embedding_agg``
in python/data/values.py:346-380).

On TPU these are jax.ops.segment_* reductions — already fused by XLA.
``embedding_agg`` routes to the Pallas double-buffered DMA kernel
(ops/pallas/spmm.py) under ``conf.use_pallas``, which skips the
[b, cap, D] HBM gather intermediate the XLA formulation materialises.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_aggregate(feats: jax.Array, segment_ids: jax.Array,
                      num_segments: int, op: str = "sum") -> jax.Array:
    """feats [n, d] grouped by segment_ids [n] -> [num_segments, d]."""
    if op == "sum":
        return jax.ops.segment_sum(feats, segment_ids, num_segments=num_segments)
    if op == "mean":
        s = jax.ops.segment_sum(feats, segment_ids, num_segments=num_segments)
        cnt = jax.ops.segment_sum(jnp.ones((feats.shape[0],), feats.dtype),
                                  segment_ids, num_segments=num_segments)
        return s / jnp.maximum(cnt, 1.0)[:, None]
    if op == "max":
        return jax.ops.segment_max(feats, segment_ids, num_segments=num_segments)
    if op == "min":
        return jax.ops.segment_min(feats, segment_ids, num_segments=num_segments)
    if op == "prod":
        return jax.ops.segment_prod(feats, segment_ids, num_segments=num_segments)
    raise ValueError("unknown aggregation op %r" % op)


def gather_group_agg(table: jax.Array, idx: jax.Array,
                     op: str = "mean") -> jax.Array:
    """Aggregate table rows in fixed groups: idx [..., k] -> [n_groups, D].

    Semantically ``table[idx].reshape(-1, k, D)`` reduced over the k axis —
    the deepest-hop consumption pattern of every Ego conv.  Implementation
    exploits that the reduction is permutation-invariant WITHIN each group:
    gather rows in globally SORTED index order (≈2x faster than random
    order on tables past the ~16 MB cache tier, PERF.md rule 5 — sorted
    accesses walk HBM pages sequentially) and reduce with a segment
    scatter-add keyed by the sort permutation's group ids, so the
    permutation is never undone.  The reference does the equivalent
    server-side as Aggregator ops over gathered floats
    (graphlearn/src/core/operator/aggregator/aggregator.cc:31-60); XLA
    cannot discover this rewrite because a lone gather must preserve
    output order.

    Gated by ``conf.sorted_gather`` and a table-size floor (small tables
    are cache-resident; the sort would be pure overhead).  Reductions
    accumulate in ``conf.compute_dtype``.
    """
    from graph_learn_tpu.config import conf
    k = idx.shape[-1]
    nseg = idx.size // k
    compute = jnp.dtype(conf.compute_dtype)
    flat = jnp.clip(idx.reshape(-1), 0, table.shape[0] - 1)
    use_sorted = (conf.sorted_gather and table.ndim == 2
                  and table.size * table.dtype.itemsize
                  >= conf.sorted_gather_min_bytes)
    if not use_sorted:
        from graph_learn_tpu.ops.pallas.dispatch import feature_gather
        rows = feature_gather(table, flat).astype(compute)
        rows = rows.reshape(nseg, k, table.shape[-1])
        if op == "mean":
            return jnp.mean(rows, axis=1)
        if op == "sum":
            return jnp.sum(rows, axis=1)
        if op == "max":
            return jnp.max(rows, axis=1)
        raise ValueError("unknown group aggregation op %r" % op)
    order = jnp.argsort(flat)
    rows = table[flat[order]].astype(compute)
    seg = (order // k).astype(jnp.int32)
    if op == "max":
        return jax.ops.segment_max(rows, seg, num_segments=nseg)
    if op in ("sum", "mean"):
        out = jax.ops.segment_sum(rows, seg, num_segments=nseg)
        return out / k if op == "mean" else out
    raise ValueError("unknown group aggregation op %r" % op)


def embedding_agg(float_attrs: jax.Array, ids: jax.Array, degrees: jax.Array,
                  op: str = "sum") -> jax.Array:
    """Aggregate float attrs of SparseNodes rows ([b, cap] + degrees [b]).

    Equivalent of ``SparseNodes.embedding_agg`` (values.py:346-380): one
    vector per seed, reduced over its (masked) neighbor slots.
    """
    from graph_learn_tpu.config import conf
    # f32 only: the kernel DMAs per-row (1, D) HBM slices, which Mosaic
    # rejects for sublane-packed dtypes (bf16 needs 8-row alignment) —
    # see ops/pallas/dispatch.py feature_gather for the measured error
    if conf.use_pallas and op in ("sum", "mean", "max", "min") \
            and float_attrs.ndim == 2 and float_attrs.shape[1] % 128 == 0 \
            and float_attrs.dtype == jnp.float32:
        import jax as _jax

        from graph_learn_tpu.ops.pallas.spmm import segment_spmm
        # the kernel DMAs rows at ids[i, c] for c < deg[i] with no bounds
        # checks — clip ids into the table and clamp degrees to cap so
        # padded (-1) slots / overlong degrees can't trigger out-of-range
        # HBM DMAs (the XLA path below masks these instead)
        cap_ = ids.shape[1]
        safe_ids = jnp.clip(ids, 0, float_attrs.shape[0] - 1)
        safe_deg = jnp.clip(degrees, 0, cap_)
        return segment_spmm(float_attrs, safe_ids, safe_deg, agg=op,
                            interpret=_jax.default_backend() != "tpu")
    b, cap = ids.shape
    feats = float_attrs[jnp.clip(ids, 0, float_attrs.shape[0] - 1)]
    mask = (jnp.arange(cap, dtype=jnp.int32)[None, :] < degrees[:, None])
    m = mask[..., None]
    if op == "sum":
        return jnp.sum(jnp.where(m, feats, 0.0), axis=1)
    if op == "mean":
        s = jnp.sum(jnp.where(m, feats, 0.0), axis=1)
        return s / jnp.maximum(degrees[:, None].astype(feats.dtype), 1.0)
    if op == "max":
        return jnp.max(jnp.where(m, feats, -jnp.inf), axis=1)
    if op == "min":
        return jnp.min(jnp.where(m, feats, jnp.inf), axis=1)
    if op == "prod":
        return jnp.prod(jnp.where(m, feats, 1.0), axis=1)
    raise ValueError("unknown aggregation op %r" % op)
