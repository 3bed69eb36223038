"""Neighbor sampling kernels: the GSL ``.sample(k).by(strategy)`` strategies.

Strategy parity with the reference sampler operators
(reference: graphlearn/src/core/operator/sampler/):

- ``random``            random_sampler.cc:25 (uniform with replacement,
                        filter rejection with SamplingRetryTimes retries)
- ``topk``              topk_sampler.cc:25 (first k of weight-desc adjacency,
                        circular padding)
- ``edge_weight``       edge_weight_sampler.cc:27 (weight-proportional; the
                        reference builds AliasMethod tables, we bisect the
                        per-row inverse CDF built at ingest)
- ``in_degree``         in_degree_sampler.cc:27 (neighbor prob ∝ dst
                        in-degree)
- ``random_without_replacement``  random_without_replacement_sampler.cc:27
                        (distinct draws; all + padding when degree <= k)
- ``full``              full_sampler.cc:26 (all neighbors, variable degree;
                        on TPU a static cap + degrees/mask)

All samplers are jit-friendly: fixed [batch, k] outputs, zero-degree seeds
filled with ``conf.default_neighbor_id`` and edge id -1 (parity:
res->FillWith(GLOBAL_FLAG(DefaultNeighborId), -1)).

Filters (reference sampler/filter.cc): ``exclude_dst`` drops one given
neighbor id per seed (unsupervised edge sampling), ``ts_upper`` keeps only
neighbors with timestamp strictly below a per-seed bound (temporal graphs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import row_sharded_sampler
from graph_learn_tpu.core.store import DeviceCSR
from graph_learn_tpu.ops.segment import (flat_gather, row_bounds_csr,
                                         segmented_searchsorted)


@dataclasses.dataclass(frozen=True)
class SampleFilter:
    """Per-seed rejection predicates (reference filter.h)."""

    exclude_dst: Optional[jax.Array] = None  # [b] neighbor id to reject
    ts_upper: Optional[jax.Array] = None  # [b] timestamp upper bound

    def hit(self, seed_axis_ids: jax.Array, cand_ids: jax.Array,
            cand_ts: Optional[jax.Array]) -> jax.Array:
        """True where a candidate violates the filter. cand_ids: [b, ...]."""
        bad = jnp.zeros(cand_ids.shape, dtype=bool)
        if self.exclude_dst is not None:
            excl = self.exclude_dst.reshape(
                (-1,) + (1,) * (cand_ids.ndim - 1))
            bad |= cand_ids == excl
        if self.ts_upper is not None and cand_ts is not None:
            ub = self.ts_upper.reshape((-1,) + (1,) * (cand_ids.ndim - 1))
            bad |= cand_ts >= ub
        return bad


def _nwin(csr: DeviceCSR) -> int:
    """Tiled rows per seed WINDOW covering any row of this CSR.

    A seed's draws all land in [start, start+deg) — at most
    ceil((127 + max_degree) / 128) consecutive 128-lane tiles.  Fetching
    that window ONCE per seed and selecting lanes on-chip replaces k
    independent row fetches (and log-d bisection probes) with 2-3 fetches.
    0 disables the window path (hub-degree graphs fall back to per-draw
    tiled gathers / bisection).
    """
    md = csr.max_degree
    if md and md <= 256:
        return (md + 254) // 128
    return 0


def fetch_window(arr2d: jax.Array, base: jax.Array, nwin: int):
    """Fetch per-seed windows of ``nwin`` consecutive tiled rows.

    base: [b] tiled-row index of each seed's window start.  Returns
    (win [b, nwin*128], lane_abs [b, nwin*128] absolute flat positions of
    each window lane) — shared by value selects and in-row counting.
    """
    r = arr2d.shape[0]
    parts = [arr2d[jnp.clip(base + i, 0, max(r - 1, 0))]
             for i in range(nwin)]
    win = jnp.concatenate(parts, axis=-1) if nwin > 1 else parts[0]
    lane_abs = (base << 7)[:, None] + jnp.arange(win.shape[-1],
                                                 dtype=jnp.int32)
    return win, lane_abs


def _window_select(arr2d: jax.Array, base: jax.Array, pos: jax.Array,
                   nwin: int) -> jax.Array:
    """Select arr[pos] from per-seed windows of ``nwin`` tiled rows.

    base: [b] tiled-row index of each seed's window start; pos: [b, ...]
    absolute flat positions, all within the window.
    """
    b = base.shape[0]
    win, _ = fetch_window(arr2d, base, nwin)
    w = win.shape[-1]
    extra = pos.ndim - 1
    rel = pos - (base << 7).reshape((b,) + (1,) * extra)
    lane = jnp.arange(w, dtype=jnp.int32)
    sel = lane.reshape((1,) * pos.ndim + (w,)) == rel[..., None]
    winx = win.reshape((b,) + (1,) * extra + (w,))
    return jnp.sum(jnp.where(sel, winx, 0), axis=-1)


def _gather(csr: DeviceCSR, pos: jax.Array, valid: jax.Array,
            start: Optional[jax.Array] = None):
    """Gather (nbr_ids, edge_ids) at flat CSR positions, masking invalid.

    When ``start`` (each seed's row start) is given and the graph's max
    degree admits it, uses the per-seed window path (_nwin).
    """
    nwin = _nwin(csr) if start is not None else 0
    if nwin:
        base = start >> 7
        ids = _window_select(csr.nbr_tiled, base, pos, nwin)
        eids = _window_select(csr.eid_tiled, base, pos, nwin)
    else:
        posc = jnp.clip(pos, 0, max(csr.n_edges - 1, 0))
        ids = flat_gather(csr.nbr_tiled, posc)
        eids = flat_gather(csr.eid_tiled, posc)
    ids = jnp.where(valid, ids, jnp.int32(conf.default_neighbor_id))
    eids = jnp.where(valid, eids, jnp.int32(-1))
    return ids, eids


def _excl_rel(csr: DeviceCSR, start: jax.Array, end: jax.Array,
              excl: jax.Array):
    """(rel, present): within-row position of the excluded neighbor id.

    The device analogue of the reference's Filter::ActOn removing hit
    indices before selection (sampler/filter.cc, used by every sampler,
    e.g. topk_sampler.cc:55-57).  Window path only (max_degree <= 256):
    one fetch of the row's id window locates the excluded id exactly.
    Returns None when the CSR has no window (hub-degree graphs) — callers
    raise loudly rather than silently ignoring the filter.
    """
    nwin = _nwin(csr)
    if not nwin:
        return None
    win, lane_abs = fetch_window(csr.nbr_tiled, start >> 7, nwin)
    in_row = (lane_abs >= start[:, None]) & (lane_abs < end[:, None])
    hit = in_row & (win == excl[:, None])
    pos = jnp.max(jnp.where(hit, lane_abs, -1), axis=-1)
    present = pos >= 0
    rel = jnp.where(present, pos - start, jnp.int32(2 ** 30))
    return rel, present


def _filter_guard(csr: DeviceCSR, flt, strategy: str):
    """Resolve a filter to (rel, present) or raise if unsupported here."""
    if flt is None or flt.exclude_dst is None:
        return None
    nwin = _nwin(csr)
    if not nwin:
        raise ValueError(
            ".filter() with strategy %r needs the windowed row path "
            "(max_degree <= 256); on hub-degree graphs only 'random' "
            "supports filters (rejection retries)" % strategy)
    return flt.exclude_dst


def _apply_filter_retry(csr: DeviceCSR, key: jax.Array, seeds: jax.Array,
                        start, deg, k: int, flt: Optional[SampleFilter],
                        edge_ts: Optional[jax.Array],
                        draw_fn) -> jax.Array:
    """Draw with rejection: R+1 candidate rounds, keep first passing draw.

    Mirrors the reference retry loop (random_sampler.cc:62-72): after
    SamplingRetryTimes failures the last candidate is accepted anyway.
    """
    retries = conf.sampling_retry_times
    if flt is None or (flt.exclude_dst is None and flt.ts_upper is None):
        u = jax.random.uniform(key, seeds.shape + (k,))
        return draw_fn(u)
    rounds = retries + 1
    u = jax.random.uniform(key, seeds.shape + (k, rounds))
    pos = draw_fn(u)  # [b, k, rounds] flat positions
    posc = jnp.clip(pos, 0, max(csr.n_edges - 1, 0))
    cand = flat_gather(csr.nbr_tiled, posc)
    cand_eid = (flat_gather(csr.eid_tiled, posc)
                if edge_ts is not None else None)
    cand_ts = None
    if edge_ts is not None:
        cand_ts = edge_ts[jnp.clip(cand_eid, 0, None)]
    bad = flt.hit(seeds, cand, cand_ts)  # [b, k, rounds]
    # first acceptable round per draw (else last round)
    first_ok = jnp.argmax(~bad, axis=-1)
    all_bad = jnp.all(bad, axis=-1)
    pick = jnp.where(all_bad, rounds - 1, first_ok)
    return jnp.take_along_axis(pos, pick[..., None], axis=-1)[..., 0]


@row_sharded_sampler
def uniform_sample(csr: DeviceCSR, seeds: jax.Array, k: int, key: jax.Array,
                   flt: Optional[SampleFilter] = None,
                   edge_ts: Optional[jax.Array] = None):
    """Uniform with replacement. Returns (nbr_ids [b,k], edge_ids [b,k])."""
    start, _, deg = row_bounds_csr(csr, seeds)

    def draw(u):
        idx = jnp.floor(u * deg.reshape(deg.shape + (1,) * (u.ndim - 1))
                        ).astype(jnp.int32)
        idx = jnp.minimum(idx, jnp.maximum(deg, 1).reshape(
            deg.shape + (1,) * (u.ndim - 1)) - 1)
        return start.reshape(start.shape + (1,) * (u.ndim - 1)) + idx

    pos = _apply_filter_retry(csr, key, seeds, start, deg, k, flt, edge_ts, draw)
    valid = (deg > 0)[..., None]
    return _gather(csr, pos, valid, start=start)


@row_sharded_sampler
def topk_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                key: Optional[jax.Array] = None,
                flt: Optional[SampleFilter] = None):
    """First k of the (weight-desc / ts-asc) adjacency; circular padding.

    With a filter, the excluded neighbor is removed from the row before
    selection (reference topk_sampler.cc:55-57 filter->ActOn)."""
    start, end, deg = row_bounds_csr(csr, seeds)
    excl = _filter_guard(csr, flt, "topk")
    rel, present = (None, None)
    if excl is not None:
        rel, present = _excl_rel(csr, start, end, excl)
        deg = deg - present.astype(jnp.int32)
    ar = jnp.arange(k, dtype=jnp.int32)
    if conf.padding_mode == 1:  # circular (circular_padder.h)
        idx = ar[None, :] % jnp.maximum(deg, 1)[:, None]
    else:  # replicate last (replicate_padder.h)
        idx = jnp.minimum(ar[None, :], jnp.maximum(deg, 1)[:, None] - 1)
    if rel is not None:
        # skip over the removed slot: filtered index j -> j (+1 past rel)
        idx = idx + (present[:, None] & (idx >= rel[:, None]))
    pos = start[:, None] + idx
    valid = (deg > 0)[:, None]
    return _gather(csr, pos, valid, start=start)


@row_sharded_sampler
def weighted_sample(csr: DeviceCSR, seeds: jax.Array, k: int, key: jax.Array,
                    by: str = "edge_weight",
                    flt: Optional[SampleFilter] = None):
    """Inverse-CDF weighted sampling (edge_weight or in_degree strategy).

    With a filter, the excluded neighbor's probability mass is removed
    exactly: draw u' over the remaining mass and shift past the excluded
    slot's CDF interval (reference edge_weight_sampler.cc:58-61
    filter->ActOn before the weighted pick)."""
    if csr.n_edges == 0:
        # empty adjacency: every seed gets the default fill (parity with
        # res->FillWith on degree-0 rows)
        return topk_sample(csr, seeds, k)
    cum2d = csr.cumw_tiled if by == "edge_weight" else csr.cumind_tiled
    if cum2d is None:
        raise ValueError(
            "CSR has no %s CDF table (source not weighted?)" % by)
    start, end, deg = row_bounds_csr(csr, seeds)
    excl = _filter_guard(csr, flt, by)
    u = jax.random.uniform(key, seeds.shape + (k,))
    nwin = _nwin(csr)
    if nwin:
        # window the whole per-row CDF and COUNT lanes below u — one
        # fetch replaces the log-d bisection probes entirely
        win, lane_abs = fetch_window(cum2d, start >> 7, nwin)
        in_row = (lane_abs >= start[:, None]) & (lane_abs < end[:, None])
        t = u
        if excl is not None:
            rel, present = _excl_rel(csr, start, end, excl)
            deg = deg - present.astype(jnp.int32)
            # CDF mass of the excluded slot: [cdf[rel-1], cdf[rel])
            relc = jnp.minimum(rel, jnp.maximum(end - start, 1) - 1)
            at_x = _window_select(cum2d, start >> 7, start + relc, nwin)
            prev_x = jnp.where(relc > 0, _window_select(
                cum2d, start >> 7, start + relc - 1, nwin), 0.0)
            w_x = jnp.where(present, at_x - prev_x, 0.0)
            u2 = u * (1.0 - w_x)[:, None]
            t = jnp.where(u2 < prev_x[:, None], u2, u2 + w_x[:, None])
            below = in_row[:, None, :] & (win[:, None, :] < t[..., None])
            pos = start[:, None] + jnp.sum(below, axis=-1).astype(jnp.int32)
            # float-boundary guard: if the count lands exactly on the
            # excluded slot, step off it (away from the row edge)
            on_x = present[:, None] & (pos - start[:, None] == relc[:, None])
            step = jnp.where(relc == jnp.maximum(end - start, 1) - 1,
                             -1, 1)[:, None]
            pos = jnp.where(on_x, pos + step, pos)
        else:
            below = in_row[:, None, :] & (win[:, None, :] < t[..., None])
            pos = start[:, None] + jnp.sum(below, axis=-1).astype(jnp.int32)
    else:
        from graph_learn_tpu.ops.segment import _bisect_iters
        pos = segmented_searchsorted(None, start[:, None], end[:, None], u,
                                     side="left", vals2d=cum2d,
                                     iters=_bisect_iters(csr.max_degree))
    pos = jnp.minimum(pos, jnp.maximum(end, 1)[:, None] - 1)
    valid = (deg > 0)[:, None]
    return _gather(csr, pos, valid, start=start)


def wor_positions(start: jax.Array, deg: jax.Array, k: int,
                  key: jax.Array, rel=None, present=None) -> jax.Array:
    """Exact uniform-without-replacement flat positions within CSR rows.

    ``start``/``deg`` define each seed's admissible window
    [start, start+deg) — the full row for plain sampling, the before-t
    prefix for temporal sampling (ops/temporal.py).

    Implementation ("virtual Fisher-Yates"): draw the j-th sample uniformly
    from [0, deg - j) over the *remaining* index space tracked implicitly
    via up to k recorded (index -> replacement) swaps.  Exact for any
    degree; with k small (fanouts <= 32) the k-step lax.scan is cheap.
    The reference uses sequential rejection
    (random_without_replacement_sampler.cc:27).
    For degree <= k all neighbors are returned then padded (parity).
    """
    b = start.shape[0]
    degm = jnp.maximum(deg, 1)

    # Virtual Fisher-Yates: maintain up to k (index -> replacement) pairs.
    # At step j we draw r in [0, deg-j); its effective value is the latest
    # replacement recorded for r (or r itself); then record r -> (deg-1-j)'s
    # effective value.  This yields exact uniform samples w/o replacement.
    keys_j = jax.random.split(key, k)

    def step(carry, kj):
        sel_keys, sel_vals, j = carry  # [b, k] recorded swaps
        span = jnp.maximum(degm - j, 1)
        r = jnp.floor(jax.random.uniform(kj, (b,)) * span).astype(jnp.int32)
        r = jnp.minimum(r, span - 1)

        def lookup(keys_, vals_, q):
            # latest recorded replacement for q (keys can repeat; the most
            # recent slot wins)
            m = keys_ == q[:, None]
            slots = jnp.where(m, jnp.arange(k, dtype=jnp.int32)[None, :], -1)
            slot = jnp.max(slots, axis=1)
            hitv = jnp.take_along_axis(
                vals_, jnp.maximum(slot, 0)[:, None], axis=1)[:, 0]
            return jnp.where(slot >= 0, hitv, q)

        value = lookup(sel_keys, sel_vals, r)
        tail = degm - 1 - j
        tail_val = lookup(sel_keys, sel_vals, tail)
        # record r -> tail_val at slot j
        sel_keys = sel_keys.at[:, j].set(r)
        sel_vals = sel_vals.at[:, j].set(tail_val)
        return (sel_keys, sel_vals, j + 1), value

    init = (jnp.full((b, k), -1, jnp.int32), jnp.zeros((b, k), jnp.int32),
            jnp.int32(0))
    (_, _, _), drawn = jax.lax.scan(step, init, keys_j)
    drawn = drawn.T  # [b, k]
    ar = jnp.arange(k, dtype=jnp.int32)[None, :]
    # for seeds with deg <= k: positions j < deg take neighbor j (all
    # neighbors), then circular padding
    take_all = ar % degm[:, None]
    idx = jnp.where(deg[:, None] > k, drawn, take_all)
    if rel is not None:
        # filtered draw space [0, deg): map index past the removed slot
        idx = idx + (present[:, None] & (idx >= rel[:, None]))
    return start[:, None] + idx


@row_sharded_sampler
def without_replacement_sample(csr: DeviceCSR, seeds: jax.Array, k: int,
                               key: jax.Array,
                               flt: Optional[SampleFilter] = None):
    """Uniform without replacement over each seed's (filtered) row."""
    start, end, deg = row_bounds_csr(csr, seeds)
    excl = _filter_guard(csr, flt, "random_without_replacement")
    rel, present = (None, None)
    if excl is not None:
        rel, present = _excl_rel(csr, start, end, excl)
        deg = deg - present.astype(jnp.int32)
    pos = wor_positions(start, deg, k, key, rel=rel, present=present)
    valid = (deg > 0)[:, None]
    return _gather(csr, pos, valid, start=start)


@row_sharded_sampler
def full_sample(csr: DeviceCSR, seeds: jax.Array, cap: int,
                flt: Optional[SampleFilter] = None):
    """All neighbors up to a static cap. Returns (ids, eids, degrees).

    degrees is clipped to cap (reference truncates to count when count > 0,
    full_sampler.cc:31-60).  With a filter, the excluded neighbor is
    compacted out of the row before capping.
    """
    start, end, deg = row_bounds_csr(csr, seeds)
    excl = _filter_guard(csr, flt, "full")
    ar = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = ar
    if excl is not None:
        rel, present = _excl_rel(csr, start, end, excl)
        deg = deg - present.astype(jnp.int32)
        idx = ar + (present[:, None] & (ar >= rel[:, None]))
    pos = start[:, None] + idx
    valid = ar < deg[:, None]
    ids, eids = _gather(csr, pos, valid, start=start)
    return ids, eids, jnp.minimum(deg, cap).astype(jnp.int32)


STRATEGY_FNS = {
    "random": uniform_sample,
    "topk": topk_sample,
    "edge_weight": weighted_sample,
    "in_degree": weighted_sample,
    "random_without_replacement": without_replacement_sample,
    "full": full_sample,
}


def register_sampler(name: str, fn) -> None:
    """Register a custom neighbor-sampling strategy for GSL ``.by(name)``.

    The documented extension point of the reference — subclass + 
    REGISTER_OPERATOR + request factory (reference:
    docs/en/gl/developer/operator.md:49-104, core/operator/op_registry.h)
    — collapses to one jit-compatible function here:

        fn(csr: DeviceCSR, seeds: [b] int32, k: int, key) -> (ids, eids)

    returning [b, k] neighbor/edge-id arrays (use ops.sampling helpers:
    row_bounds_csr, _gather, _window_select).  Built-in names cannot be
    overridden.
    """
    if name in STRATEGY_FNS:
        raise ValueError("strategy %r already registered" % name)
    STRATEGY_FNS[name] = fn
