"""Negative sampling kernels: ``.outNeg(e).sample(k).by(strategy)``.

Strategy parity with the reference negative samplers
(reference: graphlearn/src/core/operator/sampler/):

- ``random``      random_negative_sampler.cc:26 — uniform over the ids that
                  appear as destinations of the edge type (GetAllDstIds);
                  NOTE: the reference does NOT reject true neighbors here.
- ``in_degree``   in_degree_negative_sampler.cc:30 — candidates ∝ in-degree,
                  true neighbors rejected; after kRetryTimes rounds the
                  constraint is dropped (the Soft variant drops it from the
                  start: SoftInDegreeNegativeSampler, :110).
- ``node_weight`` node_weight_negative_sampler.cc:30 — candidates ∝ node
                  weight over the dst node table, strict with fallback.
- ``conditional`` conditional_negative_sampler.cc:33 — attr-conditioned
                  (see ops/conditional.py).

Device translation: candidate draws are inverse-CDF bisections over
precomputed tables; membership rejection = ops/segment.row_member
(windowed row compare, or bisection over the id-sorted row on
hub-degree graphs); "retry" = R parallel candidate rounds with
first-acceptable selection (R = conf.sampling_retry_times).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.store import DeviceEdgeTable, DeviceNodeTable


def _draw_uniform_ids(cand_ids: jax.Array, key: jax.Array, shape):
    n = cand_ids.shape[0]
    idx = jax.random.randint(key, shape, 0, jnp.maximum(n, 1))
    return cand_ids[idx]


def _draw_cdf_ids(cand_ids: jax.Array, cdf: jax.Array, key: jax.Array, shape):
    u = jax.random.uniform(key, shape)
    pos = jnp.searchsorted(cdf, u, side="left")
    pos = jnp.clip(pos, 0, cand_ids.shape[0] - 1)
    return cand_ids[pos]


def _reject_neighbors(et: DeviceEdgeTable, seeds: jax.Array,
                      cands: jax.Array, reverse: bool = False) -> jax.Array:
    """[b, k, R] -> True where candidate is a true neighbor of its seed.

    Shard-transparent: on a graph-axis-sharded store each shard checks
    membership for the seed rows it owns and one psum stitches the bool
    verdicts (core/sharding.py)."""
    from graph_learn_tpu.core.sharding import (ShardedCSR, own_rows,
                                               psum_owned)
    csr = et.inc if reverse else et.out
    own = None
    if isinstance(csr, ShardedCSR):
        seeds, own = own_rows(csr.rows_per_shard, csr.axis, seeds)
        axis, csr = csr.axis, csr.local
    from graph_learn_tpu.ops.segment import row_member
    hit = row_member(csr, seeds, cands)
    if own is not None:
        hit = psum_owned(hit.astype(jnp.int32), own, axis) > 0
    return hit


def negative_sample_from_nodes(nt: DeviceNodeTable, b: int, k: int,
                               key: jax.Array,
                               strategy: str = "random") -> jax.Array:
    """``Neg(node_type)``: negatives drawn from a node SET, no topology.

    Reference parity: NegativeSampler with ``node_from=NodeFrom.NODE``
    (gsl/dag_node.py:509-515) — the candidate pool is the node storage of
    the given type (utils/storage_wrapper.h:27-46), so there is no
    neighbor structure to reject against: ``random`` is uniform over the
    node set, ``node_weight`` draws ∝ node weight.
    """
    all_ids = jnp.arange(nt.num_nodes, dtype=jnp.int32)
    if strategy in ("random", "in_degree", "soft_in_degree"):
        # in_degree degrades to uniform on a bare node set (no topology)
        return _draw_uniform_ids(all_ids, key, (b, k))
    if strategy == "node_weight":
        if nt.cum_weights is None:
            raise ValueError("node_weight negative sampling needs a weighted "
                             "node table")
        return _draw_cdf_ids(all_ids, nt.cum_weights, key, (b, k))
    raise ValueError("unknown node-set negative strategy %r" % strategy)


def negative_sample(et: DeviceEdgeTable, seeds: jax.Array, k: int,
                    key: jax.Array, strategy: str = "random",
                    dst_table: Optional[DeviceNodeTable] = None,
                    reverse: bool = False) -> jax.Array:
    """Returns [b, k] int32 negative dst indices.

    ``reverse=True`` samples negatives on the incoming side (``inNeg``):
    candidate pool and membership use the reversed topology.
    """
    pool = et.unique_src if reverse else et.unique_dst
    pool_cdf = et.unique_src_outdeg_cdf if reverse else et.unique_dst_indeg_cdf
    if pool is None:
        from graph_learn_tpu.errors import InvalidArgumentError
        raise InvalidArgumentError(
            "negative sampling needs the candidate-pool tables, which "
            "storage_profile='minimal' drops — use the default profile "
            "for queries with outNeg/inNeg")
    b = seeds.shape[0]
    if strategy == "random":
        # parity: no neighbor rejection (random_negative_sampler.cc:53-59)
        return _draw_uniform_ids(pool, key, (b, k))

    rounds = conf.sampling_retry_times + 1
    if strategy in ("in_degree", "soft_in_degree"):
        cands = _draw_cdf_ids(pool, pool_cdf, key, (b, k, rounds))
    elif strategy == "node_weight":
        if dst_table is None or dst_table.cum_weights is None:
            raise ValueError("node_weight negative sampling needs a weighted "
                             "dst node table")
        all_ids = jnp.arange(dst_table.num_nodes, dtype=jnp.int32)
        cands = _draw_cdf_ids(all_ids, dst_table.cum_weights, key,
                              (b, k, rounds))
    else:
        raise ValueError("unknown negative strategy %r" % strategy)

    if strategy == "soft_in_degree":
        return cands[..., 0]
    bad = _reject_neighbors(et, seeds, cands, reverse=reverse)
    first_ok = jnp.argmax(~bad, axis=-1)
    all_bad = jnp.all(bad, axis=-1)
    pick = jnp.where(all_bad, rounds - 1, first_ok)  # fallback: accept anyway
    return jnp.take_along_axis(cands, pick[..., None], axis=-1)[..., 0]
