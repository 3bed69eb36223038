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
from graph_learn_tpu.ops.sampling import _excl_rel, _filter_guard, _gather
from graph_learn_tpu.ops.segment import (row_bounds_csr,
                                         segmented_searchsorted)


def _prefix_filter(csr: DeviceCSR, start, hi, deg, flt, strategy: str):
    """Compose an exclude-dst filter with the before-t prefix.

    Locates the excluded neighbor WITHIN the admissible prefix
    [start, hi) and removes it from the draw space: returns
    (rel, present, deg') where rel is the excluded slot's within-prefix
    index and deg' the filtered temporal degree.  The device analogue of
    the reference stacking Filter(ts LARGER_THAN) + Filter(id EQUAL)
    inside one sampler (sampler/filter.cc Filter::HitAll).
    """
    excl = _filter_guard(csr, flt, strategy)
    if excl is None:
        return None, None, deg
    rel, present = _excl_rel(csr, start, hi, excl)
    return rel, present, deg - present.astype(jnp.int32)


def _skip_excluded(idx, rel, present):
    """Map filtered draw-space indices past the removed slot."""
    if rel is None:
        return idx
    return idx + (present[:, None] & (idx >= rel[:, None]))


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
                            key: jax.Array, t_upper: jax.Array, flt=None):
    """Uniform with replacement among edges with ts < t_upper[i]."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    rel, present, deg = _prefix_filter(csr, start, hi, deg, flt, "random")
    u = jax.random.uniform(key, seeds.shape + (k,))
    idx = jnp.minimum(jnp.floor(u * deg[:, None]).astype(jnp.int32),
                      jnp.maximum(deg, 1)[:, None] - 1)
    pos = start[:, None] + _skip_excluded(idx, rel, present)
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_weighted_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                             key: jax.Array, t_upper: jax.Array,
                             by: str = "edge_weight", flt=None):
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
    rel, present, deg = _prefix_filter(csr, start, hi, deg, flt, by)
    u = jax.random.uniform(key, seeds.shape + (k,))
    from graph_learn_tpu.ops.sampling import (_nwin, _window_select,
                                              fetch_window)
    nwin = _nwin(csr)
    if nwin:
        win, lane_abs = fetch_window(cum2d, start >> 7, nwin)
        in_prefix = ((lane_abs >= start[:, None]) &
                     (lane_abs < hi[:, None]))
        # cdf value at hi-1 == max over the (ascending) prefix lanes
        c_hi = jnp.max(jnp.where(in_prefix, win, 0.0), axis=-1)
        if rel is not None:
            # remove the excluded slot's probability mass exactly (same
            # construction as the non-temporal weighted filter): draw u'
            # over the remaining prefix mass and shift past the excluded
            # slot's CDF interval [cdf[rel-1], cdf[rel])
            relc = jnp.minimum(rel, jnp.maximum(hi - start, 1) - 1)
            at_x = _window_select(cum2d, start >> 7, start + relc, nwin)
            prev_x = jnp.where(relc > 0, _window_select(
                cum2d, start >> 7, start + relc - 1, nwin), 0.0)
            w_x = jnp.where(present, at_x - prev_x, 0.0)
            u2 = u * (c_hi - w_x)[:, None]
            t = jnp.where(u2 < prev_x[:, None], u2, u2 + w_x[:, None])
            below = in_prefix[:, None, :] & (win[:, None, :] < t[..., None])
            pos = start[:, None] + jnp.sum(below, axis=-1).astype(jnp.int32)
            # float-boundary guard: never land ON the excluded slot
            on_x = present[:, None] & (pos - start[:, None] == relc[:, None])
            step = jnp.where(relc == jnp.maximum(hi - start, 1) - 1,
                             -1, 1)[:, None]
            pos = jnp.where(on_x, pos + step, pos)
        else:
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
                                        t_upper: jax.Array, flt=None):
    """Uniform without replacement among edges with ts < t_upper[i]."""
    from graph_learn_tpu.ops.sampling import wor_positions
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    rel, present, deg = _prefix_filter(csr, start, hi, deg, flt,
                                       "random_without_replacement")
    pos = wor_positions(start, deg, k, key, rel=rel, present=present)
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_topk_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                         t_upper: jax.Array, flt=None):
    """The k MOST RECENT edges before t (TGN-style recency neighborhood)."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    rel, present, deg = _prefix_filter(csr, start, hi, deg, flt, "topk")
    ar = jnp.arange(k, dtype=jnp.int32)[None, :]
    # filtered offsets from the recent end, circular over the prefix
    off = ar % jnp.maximum(deg, 1)[:, None]
    idx = jnp.maximum(deg, 1)[:, None] - 1 - off  # filtered ascending idx
    pos = start[:, None] + _skip_excluded(idx, rel, present)
    pos = jnp.maximum(pos, start[:, None])
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


@row_sharded_sampler
def temporal_full_sample(csr: DeviceCSR, seeds: jax.Array, cap: int,
                         t_upper: jax.Array, flt=None):
    """All admissible edges up to cap, most recent last (csr order)."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    rel, present, deg = _prefix_filter(csr, start, hi, deg, flt, "full")
    degc = jnp.minimum(deg, cap)
    ar = jnp.arange(cap, dtype=jnp.int32)[None, :]
    # keep the most recent `cap` of the (filtered) prefix
    idx = deg[:, None] - degc[:, None] + ar
    valid = ar < degc[:, None]
    pos = start[:, None] + _skip_excluded(idx, rel, present)
    ids, eids = _gather(csr, jnp.maximum(pos, start[:, None]), valid,
                        start=start)
    return ids, eids, degc.astype(jnp.int32)
