"""Conditional negative sampling: attribute-proportional negatives.

Parity with the reference conditional sampler
(reference: graphlearn/src/core/operator/sampler/
conditional_negative_sampler.cc:33-110, condition_table.h:57-140): given
each positive (src, dst) pair, sample ``prop * k`` negatives sharing the
positive dst's value in each selected int/float/string column (weighted by
the base strategy: uniform / in_degree / node_weight), and the remainder
unconditioned; true neighbors excluded; ``batch_share``/``unique`` options.

TPU design: per selected column the host builds a value-sorted index with
per-run (equal-value segment) weight CDFs; on device the positive's value
bisects into its run and negatives are inverse-CDF draws within the run —
replacing the reference's hash-map AttributeNodesMap with two searchsorted
passes.  String columns are hashed int columns in this store, so they use
the int path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.store import DeviceEdgeTable, NodeTable
from graph_learn_tpu.ops.segment import segmented_searchsorted


@struct.dataclass
class ColumnIndex:
    """Device arrays for one conditioned column."""

    vals_sorted: jax.Array  # [N] column values ascending
    perm: jax.Array  # [N] node index at each sorted position
    run_cdf: jax.Array  # [N] within-run normalised inclusive weight cumsum


@struct.dataclass
class ConditionTable:
    """Per-(node_table, columns, strategy) sampling tables (a pytree, so
    it travels inside the jitted plan's ``tables`` argument)."""

    int_cols: Dict[int, ColumnIndex]
    float_cols: Dict[int, ColumnIndex]

    @staticmethod
    def build(table: NodeTable, int_cols: Sequence[int],
              float_cols: Sequence[int],
              weights: Optional[np.ndarray]) -> "ConditionTable":
        """int_cols/float_cols index into int_attrs/float_attrs columns."""
        n = table.num_nodes
        w = (np.ones(n, np.float64) if weights is None
             else np.maximum(np.asarray(weights, np.float64), 0.0))

        def build_col(vals: np.ndarray) -> ColumnIndex:
            order = np.argsort(vals, kind="stable")
            sv = vals[order]
            wv = w[order]
            # run boundaries (equal values)
            new_run = np.ones(n, bool)
            new_run[1:] = sv[1:] != sv[:-1]
            run_id = np.cumsum(new_run) - 1
            run_sum = np.bincount(run_id, weights=wv)
            zero = run_sum[run_id] <= 0
            wv = np.where(zero, 1.0, wv)
            run_sum = np.bincount(run_id, weights=wv)
            cs = np.cumsum(wv)
            starts = np.where(new_run)[0]
            base = (cs - wv)[starts][run_id]
            cdf = ((cs - base) / run_sum[run_id]).astype(np.float32)
            return ColumnIndex(jnp.asarray(sv), jnp.asarray(order.astype(np.int32)),
                               jnp.asarray(cdf))

        ic = {c: build_col(table.int_attrs[:, c].astype(np.int64))
              for c in int_cols}
        fc = {c: build_col(table.float_attrs[:, c].astype(np.float64))
              for c in float_cols}
        return ConditionTable(int_cols=ic, float_cols=fc)


def _sample_matching(col: ColumnIndex, pos_vals: jax.Array, n_draw: int,
                     key: jax.Array, fallback: jax.Array) -> jax.Array:
    """[b] positive values -> [b, n_draw] node indices sharing the value.

    Rows whose value has no other holders fall back to ``fallback`` draws
    (unconditioned candidates of the same shape).
    """
    b = pos_vals.shape[0]
    lo = jnp.searchsorted(col.vals_sorted, pos_vals, side="left")
    hi = jnp.searchsorted(col.vals_sorted, pos_vals, side="right")
    found = hi > lo
    u = jax.random.uniform(key, (b, n_draw))
    pos = segmented_searchsorted(col.run_cdf, lo[:, None], hi[:, None], u,
                                 side="left")
    pos = jnp.minimum(pos, jnp.maximum(hi, 1)[:, None] - 1)
    drawn = col.perm[jnp.clip(pos, 0, col.perm.shape[0] - 1)]
    return jnp.where(found[:, None], drawn, fallback)


def _batch_member(pool: jax.Array, cands: jax.Array) -> jax.Array:
    """True where a candidate appears anywhere in ``pool`` (a small 1-D id
    set, e.g. the batch's positive dsts)."""
    sp = jnp.sort(pool)
    pos = jnp.searchsorted(sp, cands, side="left")
    pos = jnp.clip(pos, 0, sp.shape[0] - 1)
    return sp[pos] == cands


def _mark_pool_dups(pool: jax.Array, ok: jax.Array) -> jax.Array:
    """dup[b, i] = pool[b, i] equals an EARLIER acceptable pool element —
    dedupe keeping the first acceptable occurrence (the reference inserts
    accepted draws into ``nbr_set`` when ``unique``,
    attribute_nodes_map.h:118-123)."""
    m = pool.shape[1]
    eq = pool[:, :, None] == pool[:, None, :]
    lower = jnp.tril(jnp.ones((m, m), bool), -1)  # j < i
    return jnp.any(eq & lower[None] & ok[:, None, :], axis=-1)


def _first_q_acceptable(pool: jax.Array, ok: jax.Array, q: int) -> jax.Array:
    """First q acceptable candidates per row, in draw order; rows with
    fewer than q acceptable relax and take the earliest rejected draws
    (the reference clears ``nbr_set`` after retries,
    conditional_negative_sampler.cc:133-143)."""
    order = jnp.argsort(~ok, axis=1, stable=True)  # acceptable first
    return jnp.take_along_axis(pool, order[:, :q], axis=1)


def conditional_negative_sample(
        et: DeviceEdgeTable, ct: ConditionTable, seeds: jax.Array,
        pos_dst: jax.Array,
        pos_int_attrs: Optional[jax.Array],
        pos_float_attrs: Optional[jax.Array],
        k: int, key: jax.Array,
        int_cols: Sequence[int], int_props: Sequence[float],
        float_cols: Sequence[int], float_props: Sequence[float],
        base_draw, batch_share: bool = False, unique: bool = False,
        reverse: bool = False) -> jax.Array:
    """-> [b, k] negative node indices.

    ``base_draw(key, shape)`` draws unconditioned candidates (strategy-
    weighted).  Quotas follow the reference: per column
    round(prop * k), remainder unconditioned.

    Rejection parity (conditional_negative_sampler.cc:110-155): by default
    each seed's true neighbors AND its positive dst are excluded; with
    ``batch_share`` the exclusion set is the batch's positive dsts instead.
    Each quota fills with the first acceptable draws from a pool of
    ``quota * (conf.sampling_retry_times + 1)`` candidates — the parallel
    form of the reference's retry stream (attribute_nodes_map.h:111-125);
    rows short of acceptable candidates relax and accept rejected draws
    (the reference clears ``nbr_set`` after retries).  ``unique``
    additionally rejects within-row duplicates, across quota parts.
    """
    from graph_learn_tpu.ops.negative import _reject_neighbors

    b = seeds.shape[0]
    R = conf.sampling_retry_times + 1
    quotas: List[Tuple[str, int, int]] = []
    used = 0
    for c, p in zip(int_cols, int_props):
        q = int(round(p * k))
        quotas.append(("int", c, q))
        used += q
    for c, p in zip(float_cols, float_props):
        q = int(round(p * k))
        quotas.append(("float", c, q))
        used += q
    n_free = max(k - used, 0)

    # candidate pool per quota part: [b, q * R] in draw order
    pools: List[Tuple[jax.Array, int]] = []
    keys = jax.random.split(key, len(quotas) + 1)
    for (kind, c, q), kk in zip(quotas, keys[:-1]):
        if q <= 0:
            continue
        col = ct.int_cols[c] if kind == "int" else ct.float_cols[c]
        pv = (pos_int_attrs[:, c].astype(col.vals_sorted.dtype)
              if kind == "int"
              else pos_float_attrs[:, c].astype(col.vals_sorted.dtype))
        fb = base_draw(kk, (b, q * R))
        k2 = jax.random.fold_in(kk, 1)
        pools.append((_sample_matching(col, pv, q * R, k2, fb), q))
    if n_free > 0 or not pools:
        nf = max(n_free, k - used)
        pools.append((base_draw(keys[-1], (b, nf * R)), nf))

    # one membership probe over all pools (one sharded bisection + psum
    # on a partitioned store instead of one per quota part)
    all_pool = jnp.concatenate([p for p, _ in pools], axis=1)
    if batch_share:
        # exclusion set = the batch's positive dsts (:112-116)
        bad = _batch_member(pos_dst, all_pool)
    else:
        # seed's true neighbors + its own positive dst (:122-127)
        bad = _reject_neighbors(et, seeds, all_pool, reverse=reverse)
        bad = bad | (all_pool == pos_dst[:, None])

    picked: List[jax.Array] = []
    off = 0
    for pool, q in pools:
        m = pool.shape[1]
        ok = ~bad[:, off:off + m]
        off += m
        if unique:
            if picked:
                prev = jnp.concatenate(picked, axis=1)
                ok = ok & ~jnp.any(
                    pool[:, :, None] == prev[:, None, :], axis=-1)
            ok = ok & ~_mark_pool_dups(pool, ok)
        picked.append(_first_q_acceptable(pool, ok, q))
    return jnp.concatenate(picked, axis=1)[:, :k]
