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


# --- tiled flat gathers ---------------------------------------------------
#
# XLA's TPU gather of SCALARS (one int32 per index) moves a full 512-byte
# tile per element and lowers poorly: measured 2.1ms for 154k draws from a
# 3.2M-entry array on v5e.  Reformulated as a 128-lane ROW gather over a
# [E/128, 128] view plus an on-chip one-hot lane select, the same access
# runs at HBM speed (0.40ms, 5.2x).  Pairs that are always fetched
# together (nbr_id, edge_id) are interleaved into one row so both cost a
# single fetch.  This is the TPU-native replacement for the reference's
# per-seed pointer chasing (random_sampler.cc:50-72).

_LANES = 128


def pad_lanes_host(a: np.ndarray) -> np.ndarray:
    """Host-side: pad flat array to a [R, 128] lane-tiled view."""
    e = a.shape[0]
    ep = -(-max(e, 1) // _LANES) * _LANES
    if ep != e:
        a = np.concatenate([a, np.zeros(ep - e, a.dtype)])
    return a.reshape(-1, _LANES)


def pack_pairs_host(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-side: interleave two aligned flat arrays -> [R, 128] view."""
    out = np.empty(a.shape[0] * 2, dtype=a.dtype)
    out[0::2] = a
    out[1::2] = b
    return pad_lanes_host(out)


def flat_gather(arr2d: jax.Array, pos: jax.Array) -> jax.Array:
    """arr[pos] where ``arr2d`` is the pad_lanes view of flat ``arr``.

    ``pos`` is flattened internally: XLA lowers gathers with extra batch
    dims noticeably slower than a single flat index vector (measured
    0.68ms vs 0.41ms for the same 154k draws).
    """
    shp = pos.shape
    p = pos.reshape(-1)
    rows = arr2d[p >> 7]  # [M, 128] row gather: HBM-speed
    rem = (p & 127)[:, None]
    lane = jnp.arange(_LANES, dtype=jnp.int32)
    return jnp.sum(jnp.where(lane == rem, rows, 0), axis=-1).reshape(shp)


def pair_gather(packed2d: jax.Array, pos: jax.Array):
    """(a[pos], b[pos]) from a pack_pairs view — ONE row fetch for both."""
    shp = pos.shape
    p = pos.reshape(-1)
    rows = packed2d[p >> 6]
    rem = ((p & 63) << 1)[:, None]
    lane = jnp.arange(_LANES, dtype=jnp.int32)
    a = jnp.sum(jnp.where(lane == rem, rows, 0), axis=-1).reshape(shp)
    b = jnp.sum(jnp.where(lane == rem + 1, rows, 0), axis=-1).reshape(shp)
    return a, b


def segmented_searchsorted(vals: jax.Array, lo: jax.Array, hi: jax.Array,
                           queries: jax.Array, side: str = "left",
                           vals2d: jax.Array | None = None,
                           iters: int | None = None) -> jax.Array:
    """Per-query binary search within [lo_i, hi_i) of a flat sorted-by-segment array.

    vals: [E] values, sorted ascending within each segment (may be None
    when ``vals2d`` is given).
    lo, hi: int32 arrays broadcastable to queries.shape (hi exclusive).
    queries: search keys, any shape.
    vals2d: optional pad_lanes view of vals — each probe becomes a tiled
    row gather (flat_gather) instead of an XLA scalar gather.
    iters: optional iteration bound; pass ceil(log2(max segment len)) + 1
    (e.g. from DeviceCSR.max_degree) — far fewer probes than the default
    log2(E) bound.
    Returns insertion positions (global flat indices) with lo <= pos <= hi.
    """
    e = vals.shape[0] if vals is not None else vals2d.size
    if iters is None:
        iters = _bisect_iters(e)
    q = queries
    lo = jnp.broadcast_to(lo, q.shape).astype(jnp.int32)
    hi = jnp.broadcast_to(hi, q.shape).astype(jnp.int32)

    def body(_, state):
        lo_, hi_ = state
        mid = (lo_ + hi_) >> 1
        midc = jnp.clip(mid, 0, e - 1)
        v = flat_gather(vals2d, midc) if vals2d is not None else vals[midc]
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
                   queries: jax.Array,
                   sorted2d: jax.Array | None = None,
                   iters: int | None = None) -> jax.Array:
    """Is each query id present in its row's id-sorted neighbor segment?

    Replaces the reference's per-seed hash-set membership checks
    (random_negative_sampler.cc) with bisection over nbr_ids_sorted.
    """
    e = sorted_ids.shape[0] if sorted_ids is not None else sorted2d.size
    pos = segmented_searchsorted(sorted_ids, lo, hi, queries, side="left",
                                 vals2d=sorted2d, iters=iters)
    posc = jnp.clip(pos, 0, e - 1)
    in_range = pos < hi
    found = (flat_gather(sorted2d, posc) if sorted2d is not None
             else sorted_ids[posc]) == queries
    return in_range & found


def row_member(csr, rows: jax.Array, queries: jax.Array) -> jax.Array:
    """Is each query id in its row's neighbor list?  rows [b], queries
    [b, ...extra] -> bool of queries' shape.

    Window fast path (PERF.md rule 4 applied to MEMBERSHIP): when
    ``max_degree <= 256`` the row's 2-3-tile neighbor window is fetched
    once and all of the row's queries compare against it on-chip — no
    sorted table, no log-d bisection chain (each bisection iteration is
    a dependent [b, ...] tiled gather; the window is nwin independent
    row fetches + one vectorised compare).  Hub-degree graphs fall back
    to bisection over ``nbr_sorted_tiled``.
    """
    from graph_learn_tpu.ops.sampling import _nwin, fetch_window

    start, end, _ = row_bounds_csr(csr, rows)
    nwin = _nwin(csr)
    extra = queries.shape[1:]
    if nwin:
        win, lane_abs = fetch_window(csr.nbr_tiled, start >> 7, nwin)
        valid = (lane_abs >= start[:, None]) & (lane_abs < end[:, None])
        qe = queries.reshape((rows.shape[0], -1))
        hit = jnp.any((win[:, None, :] == qe[..., None])
                      & valid[:, None, :], axis=-1)
        return hit.reshape(queries.shape)
    lo = start.reshape((rows.shape[0],) + (1,) * len(extra))
    hi = end.reshape((rows.shape[0],) + (1,) * len(extra))
    return segment_member(None, lo, hi, queries,
                          sorted2d=csr.nbr_sorted_tiled,
                          iters=_bisect_iters(csr.max_degree))


def row_bounds(row_offsets: jax.Array, rows: jax.Array):
    """(start, end, degree) of each row, any batch shape."""
    start = row_offsets[rows]
    end = row_offsets[rows + 1]
    return start, end, end - start


def row_bounds_csr(csr, rows: jax.Array):
    """row_bounds via the CSR's interleaved (start, end) pair table when
    present — one tiled row fetch instead of two scalar gathers."""
    if getattr(csr, "off_pairs", None) is not None:
        start, end = pair_gather(csr.off_pairs, rows)
        return start, end, end - start
    return row_bounds(csr.row_offsets, rows)


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
