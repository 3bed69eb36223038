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


def temporal_uniform_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                            key: jax.Array, t_upper: jax.Array):
    """Uniform with replacement among edges with ts < t_upper[i]."""
    start, hi, deg = _cutoffs(csr, seeds, t_upper)
    u = jax.random.uniform(key, seeds.shape + (k,))
    idx = jnp.minimum(jnp.floor(u * deg[:, None]).astype(jnp.int32),
                      jnp.maximum(deg, 1)[:, None] - 1)
    pos = start[:, None] + idx
    return _gather(csr, pos, (deg > 0)[:, None], start=start)


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
