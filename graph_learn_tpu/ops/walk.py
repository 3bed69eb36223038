"""Random walks: DeepWalk (uniform) and node2vec p/q biased walks.

Parity with the reference random-walk operator
(reference: graphlearn/src/core/operator/random_walk/random_walk.cc:30-200):
returns a [batch, walk_len] id matrix whose first column is the seed; a
stuck walk (zero out-degree) emits the default id for all remaining steps
(random_walk.cc:58 pushes DefaultNeighborId).  We emit -1 (an invalid dense
index, easily maskable) instead of the reference's raw default id 0, since 0
is a valid dense index here.

TPU redesign: the reference walks step-by-step through sharded RPC calls;
here the whole batch advances in one lax.scan over steps, each step a
vectorised uniform/biased neighbor draw.  p/q bias uses rejection sampling
(Grover & Leskovec node2vec; also how csrgraph/pecanpy implement it):
propose a uniform neighbor y of v, accept with prob w(y)/max_w where
w = 1/p if y == prev, 1 if y is a neighbor of prev, 1/q otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.sharding import ShardedCSR, own_rows, psum_owned
from graph_learn_tpu.core.store import DeviceCSR
from graph_learn_tpu.ops.segment import flat_gather, row_bounds_csr


def _stitch_ids(vals: jax.Array, own: jax.Array, axis: str) -> jax.Array:
    """psum-stitch an id array that uses -1 as the stuck/invalid sentinel.

    Stitching happens in id+1 space so rows with NO owner (cur == -1, or
    the walk stepped off the graph) sum to 0 and decode back to -1 —
    unlike raw psum where an unowned row's 0 collides with node id 0.
    """
    return psum_owned(vals + 1, own, axis) - 1


def _uniform_step(csr, cur: jax.Array, key: jax.Array) -> jax.Array:
    """One uniform walk step; shard-transparent.

    On a :class:`ShardedCSR` each shard advances the walkers it owns and
    one psum recombines — the per-step remote hop of the reference's
    RemoteOperator walk (random_walk.cc:30-75) become per-step psums.
    Randomness is replicated (same key, same shapes), so sharded walks
    are bitwise-identical to single-device walks.
    """
    if isinstance(csr, ShardedCSR):
        loc, own = own_rows(csr.rows_per_shard, csr.axis,
                            jnp.maximum(cur, 0))
        nxt = _uniform_step(csr.local, loc, key)
        return _stitch_ids(jnp.where(cur >= 0, nxt, -1),
                           own & (cur >= 0), csr.axis)
    start, _, deg = row_bounds_csr(csr, jnp.maximum(cur, 0))
    u = jax.random.uniform(key, cur.shape)
    idx = jnp.minimum(jnp.floor(u * deg).astype(jnp.int32),
                      jnp.maximum(deg, 1) - 1)
    posc = jnp.clip(start + idx, 0, max(csr.n_edges - 1, 0))
    nxt = flat_gather(csr.nbr_tiled, posc)
    return jnp.where((deg > 0) & (cur >= 0), nxt, jnp.int32(-1))


def deepwalk(csr: DeviceCSR, seeds: jax.Array, walk_len: int,
             key: jax.Array) -> jax.Array:
    """[b] seeds -> [b, walk_len] walks (col 0 = seed)."""
    keys = jax.random.split(key, max(walk_len - 1, 1))

    def step(cur, k):
        nxt = _uniform_step(csr, cur, k)
        return nxt, nxt

    _, tail = jax.lax.scan(step, seeds.astype(jnp.int32), keys[:walk_len - 1])
    return jnp.concatenate([seeds[:, None].astype(jnp.int32), tail.T], axis=1)


def node2vec_walk(csr: DeviceCSR, seeds: jax.Array, walk_len: int,
                  key: jax.Array, p: float = 1.0, q: float = 1.0,
                  num_tries: int = 8) -> jax.Array:
    """p/q-biased walk via vectorised rejection sampling.

    ``num_tries`` proposal rounds per step; if all rejected the last
    proposal is taken (bias error decays as max_w-miss^tries).
    """
    if p == 1.0 and q == 1.0:
        return deepwalk(csr, seeds, walk_len, key)
    from graph_learn_tpu.ops.sampling import _nwin
    _local = csr.local if hasattr(csr, "local") else csr
    if _local.nbr_sorted_tiled is None and _nwin(_local) == 0:
        from graph_learn_tpu.errors import InvalidArgumentError
        raise InvalidArgumentError(
            "p/q-biased walks need a neighbor-membership probe; at "
            "max_degree %d the window path is unavailable (it needs "
            "1 <= max_degree <= 256) and storage_profile='minimal' "
            "dropped the id-sorted tables the bisection fallback needs "
            "— use the default profile (deepwalk p=q=1 works on "
            "minimal)" % _local.max_degree)
    inv_p, inv_q = 1.0 / p, 1.0 / q
    max_w = max(inv_p, 1.0, inv_q)
    keys = jax.random.split(key, max(walk_len - 1, 1))

    def _candidates(local, cur, k1):
        """Uniform proposals for live walkers against ``local`` rows."""
        start, _, deg = row_bounds_csr(local, jnp.maximum(cur, 0))
        u = jax.random.uniform(k1, cur.shape + (num_tries,))
        idx = jnp.minimum(jnp.floor(u * deg[:, None]).astype(jnp.int32),
                          jnp.maximum(deg, 1)[:, None] - 1)
        cpos = jnp.clip(start[:, None] + idx,
                        0, max(local.n_edges - 1, 0))
        cand = flat_gather(local.nbr_tiled, cpos)
        return jnp.where((deg > 0)[:, None], cand, jnp.int32(-1))

    def _membership(local, prev, cand):
        # windowed when max_degree admits it (PERF rule 4), bisection
        # over the sorted row otherwise
        from graph_learn_tpu.ops.segment import row_member
        return row_member(local, jnp.maximum(prev, 0), cand)

    def step(carry, k):
        prev, cur = carry
        k1, k2 = jax.random.split(k)
        if isinstance(csr, ShardedCSR):
            # cur's owner proposes candidates; prev's owner answers the
            # membership probe; both recombine with one psum each (the
            # reference walks shard-to-shard the same way,
            # random_walk.cc:30-75 per-step remote requests)
            loc_c, own_c = own_rows(csr.rows_per_shard, csr.axis,
                                    jnp.maximum(cur, 0))
            cand = _stitch_ids(_candidates(csr.local, loc_c, k1),
                               own_c & (cur >= 0), csr.axis)
            loc_p, own_p = own_rows(csr.rows_per_shard, csr.axis,
                                    jnp.maximum(prev, 0))
            pn = _membership(csr.local, loc_p, cand).astype(jnp.int32)
            is_pnbr = psum_owned(pn, own_p & (prev >= 0), csr.axis) > 0
        else:
            cand = _candidates(csr, cur, k1)
            cand = jnp.where((cur >= 0)[:, None], cand, jnp.int32(-1))
            is_pnbr = _membership(csr, prev, cand)
        is_prev = cand == prev[:, None]
        w = jnp.where(is_prev, inv_p, jnp.where(is_pnbr, 1.0, inv_q))
        acc = jax.random.uniform(k2, cand.shape) * max_w < w
        first = jnp.argmax(acc, axis=-1)
        none = ~jnp.any(acc, axis=-1)
        pick = jnp.where(none, num_tries - 1, first)
        nxt = jnp.take_along_axis(cand, pick[:, None], axis=-1)[:, 0]
        nxt = jnp.maximum(nxt, jnp.int32(-1))
        return (cur, nxt), nxt

    init = (seeds.astype(jnp.int32), seeds.astype(jnp.int32))
    # first step has no prev bias: uniform
    k0, krest = keys[0], keys[1:]
    first_next = _uniform_step(csr, seeds.astype(jnp.int32), k0)
    if walk_len <= 1:
        return seeds[:, None].astype(jnp.int32)
    carry = (seeds.astype(jnp.int32), first_next)
    if walk_len == 2:
        tail = first_next[None]
    else:
        _, rest = jax.lax.scan(step, carry, krest[:walk_len - 2])
        tail = jnp.concatenate([first_next[None], rest], axis=0)
    return jnp.concatenate([seeds[:, None].astype(jnp.int32), tail.T], axis=1)


def skipgram_pairs(walks: jax.Array, window: int):
    """(target, context, valid) training pairs from walks.

    Parity: the reference pairs walks on the host in the node2vec example
    (examples/tf/node2vec/dist_train.py:76-86 window pairing); here it is a
    static gather producing [b, L*(2*window)] pairs with a validity mask.
    """
    b, L = walks.shape
    tgt, ctx = [], []
    for i in range(L):
        for d in range(-window, window + 1):
            j = i + d
            if d == 0 or j < 0 or j >= L:
                continue
            tgt.append(walks[:, i])
            ctx.append(walks[:, j])
    t = jnp.stack(tgt, axis=1)
    c = jnp.stack(ctx, axis=1)
    valid = (t >= 0) & (c >= 0)
    return t, c, valid
