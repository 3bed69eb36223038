"""Temporal neighbor sampling: exact before-t prefix sampling.

Parity with the reference temporal path
(reference: timestamped adjacency sorted ts-asc memory_adj_matrix.cc:129-150;
timestamp LARGER_THAN filter sampler/filter.cc used by temporal GSL,
gsl/dag_node.py:357-364 auto-injected ts-filter edges; TGN example
examples/pytorch/tgn/temporal_batch_loader.py:26-82).

TPU redesign: because each row's edges are ts-ascending, the admissible
neighbors (ts < t) are a PREFIX — one bisection per seed yields the exact
cutoff, so sampling is uniform/recency over [start, cutoff) with no
rejection (the reference's filter retries can silently fail when most
edges are later than t).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import row_sharded_sampler
from graph_learn_tpu.core.store import DeviceCSR
from graph_learn_tpu.ops.sampling import _gather
from graph_learn_tpu.ops.segment import (row_bounds_csr,
                                         segmented_searchsorted)


def _cutoffs(csr: DeviceCSR, seeds: jax.Array, t_upper: jax.Array):
    """start, cutoff (exclusive), temporal degree for each seed."""
    if csr.ts_tiled is None:
        raise ValueError("edge type is not timestamped")
    start, end, _ = row_bounds_csr(csr, seeds)
    from graph_learn_tpu.ops.sampling import _nwin, fetch_window
    nwin = _nwin(csr)
    t = t_upper.astype(csr.ts_tiled.dtype)
    if nwin:
        win, lane_abs = fetch_window(csr.ts_tiled, start >> 7, nwin)
        in_row = (lane_abs >= start[..., None]) & (lane_abs < end[..., None])
        below = in_row & (win < t[..., None])
        hi = start + jnp.sum(below, axis=-1).astype(jnp.int32)
    else:
        from graph_learn_tpu.ops.segment import _bisect_iters
        hi = segmented_searchsorted(None, start, end, t, side="left",
                                    vals2d=csr.ts_tiled,
                                    iters=_bisect_iters(csr.max_degree))
    return start, hi, hi - start


@row_sharded_sampler
def temporal_uniform_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                            key: jax.Array, t_upper: jax.Array):
    """Uniform with replacement among edges with ts < t_upper[i]."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    u = jax.random.uniform(key, seeds.shape + (k,))
    idx = jnp.minimum(jnp.floor(u * deg[:, None]).astype(jnp.int32),
                      jnp.maximum(deg, 1)[:, None] - 1)
    pos = start[:, None] + idx
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_weighted_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                             key: jax.Array, t_upper: jax.Array,
                             by: str = "edge_weight"):
    """Weight-proportional draws restricted to edges with ts < t_upper[i].

    Composes the before-t prefix with the inverse-CDF weighted draw — the
    device analogue of the reference's Filter(ts LARGER_THAN) applied
    inside EdgeWeightSampler/InDegreeSampler (sampler/filter.h +
    edge_weight_sampler.cc:89-105, in_degree_sampler.cc:27).  The per-row
    CDF is cumulative over the whole (ts-ascending) row, so conditioning
    on the prefix [start, hi) is one extra gather: draw u' uniform in
    (0, cdf[hi-1]] and bisect left — P(j) = w_j / W_prefix exactly.
    """
    cum2d = csr.cumw_tiled if by == "edge_weight" else csr.cumind_tiled
    if cum2d is None:
        raise ValueError(
            "CSR has no %s CDF table (source not weighted?)" % by)
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    u = jax.random.uniform(key, seeds.shape + (k,))
    from graph_learn_tpu.ops.sampling import _nwin, fetch_window
    nwin = _nwin(csr)
    if nwin:
        win, lane_abs = fetch_window(cum2d, start >> 7, nwin)
        in_prefix = ((lane_abs >= start[:, None]) &
                     (lane_abs < hi[:, None]))
        # cdf value at hi-1 == max over the (ascending) prefix lanes
        c_hi = jnp.max(jnp.where(in_prefix, win, 0.0), axis=-1)
        below = in_prefix[:, None, :] & (win[:, None, :] <
                                         (u * c_hi[:, None])[..., None])
        pos = start[:, None] + jnp.sum(below, axis=-1).astype(jnp.int32)
    else:
        from graph_learn_tpu.ops.segment import (_bisect_iters, flat_gather,
                                                 segmented_searchsorted)
        c_hi = flat_gather(cum2d, jnp.clip(hi - 1, 0,
                                           max(csr.n_edges - 1, 0)))
        c_hi = jnp.where(deg > 0, c_hi, 0.0)
        pos = segmented_searchsorted(
            None, start[:, None], hi[:, None], u * c_hi[:, None],
            side="left", vals2d=cum2d, iters=_bisect_iters(csr.max_degree))
    pos = jnp.minimum(pos, jnp.maximum(hi, 1)[:, None] - 1)
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_without_replacement_sample(csr: DeviceCSR, seeds: jax.Array,
                                        k: int, key: jax.Array,
                                        t_upper: jax.Array):
    """Uniform without replacement among edges with ts < t_upper[i]."""
    from graph_learn_tpu.ops.sampling import wor_positions
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    pos = wor_positions(start, deg, k, key)
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_topk_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                         t_upper: jax.Array):
    """The k MOST RECENT edges before t (TGN-style recency neighborhood)."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    ar = jnp.arange(k, dtype=jnp.int32)[None, :]
    take = jnp.minimum(deg, k)[:, None]
    # positions hi-1, hi-2, ... (most recent first), circular over prefix
    off = ar % jnp.maximum(deg, 1)[:, None]
    pos = hi[:, None] - 1 - off
    pos = jnp.maximum(pos, start[:, None])
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_full_sample(csr: DeviceCSR, seeds: jax.Array, cap: int,
                         t_upper: jax.Array):
    """All admissible edges up to cap, most recent last (csr order)."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    degc = jnp.minimum(deg, cap)
    ar = jnp.arange(cap, dtype=jnp.int32)[None, :]
    # keep the most recent `cap` of the prefix: window [hi - degc, hi)
    pos = hi[:, None] - degc[:, None] + ar
    valid = ar < degc[:, None]
    ids, eids = _gather(csr, jnp.maximum(pos, start[:, None]), valid,
                        start=start)
    return ids, eids, degc.astype(jnp.int32)
