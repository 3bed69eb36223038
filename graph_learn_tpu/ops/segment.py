"""Segment primitives over CSR rows: bisection search and membership.

These are the device-side building blocks that replace the reference's
per-seed C++ loops (reference: core/operator/sampler/*.cc iterate seeds one
by one on CPU threads).  On TPU every per-seed operation is vectorised over
the batch; variable-degree rows are handled with per-query [lo, hi) bisection
over globally flat CSR arrays — O(log E) gathers, no dynamic shapes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bisect_iters(n: int) -> int:
    return max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)


def segmented_searchsorted(vals: jax.Array, lo: jax.Array, hi: jax.Array,
                           queries: jax.Array, side: str = "left") -> jax.Array:
    """Per-query binary search within [lo_i, hi_i) of a flat sorted-by-segment array.

    vals: [E] values, sorted ascending within each segment.
    lo, hi: int32 arrays broadcastable to queries.shape (hi exclusive).
    queries: search keys, any shape.
    Returns insertion positions (global flat indices) with lo <= pos <= hi.
    """
    e = vals.shape[0]
    iters = _bisect_iters(e)
    q = queries
    lo = jnp.broadcast_to(lo, q.shape).astype(jnp.int32)
    hi = jnp.broadcast_to(hi, q.shape).astype(jnp.int32)

    def body(_, state):
        lo_, hi_ = state
        mid = (lo_ + hi_) >> 1
        v = vals[jnp.clip(mid, 0, e - 1)]
        if side == "left":
            go_right = v < q
        else:
            go_right = v <= q
        new_lo = jnp.where(go_right & (lo_ < hi_), mid + 1, lo_)
        new_hi = jnp.where(go_right | (lo_ >= hi_), hi_, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def segment_member(sorted_ids: jax.Array, lo: jax.Array, hi: jax.Array,
                   queries: jax.Array) -> jax.Array:
    """Is each query id present in its row's id-sorted neighbor segment?

    Replaces the reference's per-seed hash-set membership checks
    (random_negative_sampler.cc) with bisection over nbr_ids_sorted.
    """
    e = sorted_ids.shape[0]
    pos = segmented_searchsorted(sorted_ids, lo, hi, queries, side="left")
    in_range = pos < hi
    found = sorted_ids[jnp.clip(pos, 0, e - 1)] == queries
    return in_range & found


def row_bounds(row_offsets: jax.Array, rows: jax.Array):
    """(start, end, degree) of each row, any batch shape."""
    start = row_offsets[rows]
    end = row_offsets[rows + 1]
    return start, end, end - start


def set_member(sorted_set: jax.Array, queries: jax.Array) -> jax.Array:
    """Membership of queries in one globally sorted id array ([-1] padding ok)."""
    pos = jnp.searchsorted(sorted_set, queries)
    pos = jnp.clip(pos, 0, sorted_set.shape[0] - 1)
    return sorted_set[pos] == queries


def segment_softmax(values: jax.Array, segment_ids: jax.Array,
                    num_segments: int, mask: jax.Array | None = None) -> jax.Array:
    """Numerically-stable softmax within segments.

    Parity: reference unsorted_segment_softmax (nn/tf/utils/softmax.py used
    by gat_conv.py:99-111).
    """
    if mask is not None:
        values = jnp.where(mask, values, -jnp.inf)
    seg_max = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = values - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        ex = jnp.where(mask, ex, 0.0)
    seg_sum = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / jnp.maximum(seg_sum[segment_ids], 1e-16)
