"""Device-side views of a graph store sharded over the mesh "graph" axis.

TPU-native replacement for the reference's distributed graph store — the
hash partitioner + request fan-out/stitch machinery
(reference: core/partition/hash_partitioner.h:90-92 hash(id) % servers,
core/runner/op_runner.h:60-152 DistributeRunner partition/parallel
Process+Call/stitch, include/shardable.h:27-100 stickers): node rows are
range-partitioned over the mesh's "graph" axis; every per-seed operator
(samplers, lookups, membership checks) runs as masked local compute on the
owning shard followed by ONE ``psum`` over the axis.  The psum IS the
stitch: non-owners contribute exact zeros, so the summed result equals the
owner's answer, in original seed order, with zero dynamic shapes and no
serialization boundary — executed inside ``shard_map`` over the same mesh
that runs the training step.

Per-device HBM holds only 1/P of the CSR + payload tables (small candidate
pools and CDF id arrays stay replicated — O(4-8 B/row) against the
O(hundreds B/row) feature payloads), so graph size scales with the number
of devices like the reference's graph size scales with server count.

Host-side construction lives in parallel/sharded_store.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from graph_learn_tpu.core.store import DeviceCSR, DeviceNodeTable

GRAPH_AXIS = "graph"


@struct.dataclass
class ShardedCSR:
    """One direction of adjacency, rows range-partitioned over ``axis``.

    ``local`` is this shard's rows re-indexed to [0, rows_per_shard) with
    GLOBAL neighbor ids and GLOBAL edge ids (so results need no rebasing).
    All static fields (n_edges padded, max_degree) are the GLOBAL values so
    every shard traces the identical program.
    """

    local: DeviceCSR
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    # conveniences used by the plan compiler's presence checks
    @property
    def nbr_ts(self):
        return self.local.nbr_ts

    @property
    def ts_tiled(self):
        return self.local.ts_tiled

    @property
    def max_degree(self):
        return self.local.max_degree


@struct.dataclass
class ShardedNodeTable:
    """Node payload rows range-partitioned over ``axis``.

    ``cum_weights`` (the global node-weight CDF for node_weight negative
    sampling) stays replicated: 4 B/row vs the payload's hundreds.
    """

    local: DeviceNodeTable
    cum_weights: Optional[jax.Array] = None  # replicated global CDF
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    num_nodes_global: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    @property
    def num_nodes(self) -> int:
        return self.num_nodes_global


@struct.dataclass
class ShardedEdgeTable:
    """Per-edge-type topology + payload, sharded over ``axis``.

    - ``out``/``inc`` CSRs are row-partitioned by src/dst owner.
    - ``src``/``dst``/payload arrays are partitioned in edge-row blocks.
    - negative-sampling candidate pools + CDFs are replicated (id-sized).
    """

    out: ShardedCSR
    src: jax.Array  # [edges_per_shard] local block
    dst: jax.Array
    inc: Optional[ShardedCSR] = None
    int_attrs: Optional[jax.Array] = None
    float_attrs: Optional[jax.Array] = None
    multival_attrs: Optional[jax.Array] = None
    multival_lens: Optional[jax.Array] = None
    weights: Optional[jax.Array] = None
    labels: Optional[jax.Array] = None
    timestamps: Optional[jax.Array] = None
    unique_dst: Optional[jax.Array] = None  # replicated
    unique_dst_indeg_cdf: Optional[jax.Array] = None
    unique_src: Optional[jax.Array] = None
    unique_src_outdeg_cdf: Optional[jax.Array] = None
    edges_per_shard: int = struct.field(pytree_node=False, default=0)
    num_edges_global: int = struct.field(pytree_node=False, default=0)
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)

    @property
    def num_edges(self) -> int:
        return self.num_edges_global


def is_sharded(x) -> bool:
    return isinstance(x, (ShardedCSR, ShardedNodeTable, ShardedEdgeTable))


# --- owner-routed payload exchange -------------------------------------
#
# The psum stitch (below) moves a DENSE [n, ...] array over the graph
# axis for every lookup — O(P * n * D) total bytes when only O(n * D) are
# real values.  For payload rows (feature vectors: the expensive leaves)
# the owner-routed path instead:
#   1. stripes the (graph-axis-replicated) id list: device g takes its
#      n/P contiguous slice,
#   2. buckets its ids by owning shard and all_to_all's the REQUESTS,
#   3. each owner gathers its owned rows locally ([P, c, D], c = bucket
#      capacity) and all_to_all's the RESPONSES back,
#   4. the result stays STRIPED over the graph axis (shard_map out_spec
#      P(('data','graph'))) — nothing is ever replicated, so total bytes
#      over the axis are O(n * D), matching the reference's owner routing
#      (op_runner.h:60-152: each shard processes only its shard's rows).
# Bucket overflow (capacity is statistical) is exact: overflowed rows are
# resolved by the psum stitch under a lax.cond that all shards agree on,
# so results are bitwise-identical to the psum path at any capacity.

@struct.dataclass
class Striped:
    """A payload leaf whose rows are striped over the graph axis.

    ``local`` is this device's [n/P, ...] stripe inside shard_map; after
    shard_map (out_spec P(('data','graph'))) it is the GLOBAL array whose
    leading dim is the flattened id count; ``logical_shape`` is the
    per-data-shard result shape to reassemble to (leading dim scales by
    the data-axis size outside)."""

    local: jax.Array
    logical_shape: tuple = struct.field(pytree_node=False, default=())


class _OwnerCtx:
    """Module-level owner-routing context (active inside the partitioned
    plan's shard_map body when conf.partition_routing == 'owner')."""

    axis: Optional[str] = None
    nshards: int = 0
    abstract: bool = False  # structure-discovery trace: no collectives


def owner_routing_active() -> bool:
    return _OwnerCtx.axis is not None


class owner_routing:
    """Context manager enabling owner-routed payload deferral."""

    def __init__(self, axis: str, nshards: int, abstract: bool = False):
        self.state = (axis, nshards, abstract)

    def __enter__(self):
        self.prev = (_OwnerCtx.axis, _OwnerCtx.nshards, _OwnerCtx.abstract)
        _OwnerCtx.axis, _OwnerCtx.nshards, _OwnerCtx.abstract = self.state
        return self

    def __exit__(self, *a):
        _OwnerCtx.axis, _OwnerCtx.nshards, _OwnerCtx.abstract = self.prev


def _route_capacity(m: int, p: int) -> int:
    from graph_learn_tpu.config import conf
    factor = getattr(conf, "owner_route_capacity", 2.0)
    return int(min(m, max(int(-(-m * factor // p)) + 8, 8)))


def owner_routed_gather(arr: jax.Array, rps: int, axis: str,
                        flat_ids: jax.Array, nshards: int) -> jax.Array:
    """Gather arr rows for THIS device's stripe of ``flat_ids``.

    flat_ids [n] is identical on every shard of ``axis``; returns the
    [n/P, ...] values for stripe ``axis_index(axis)``.  Exact for any id
    distribution (capacity overflow falls back to the psum stitch for the
    overflowed rows only)."""
    p = nshards
    n = flat_ids.shape[0]
    m = n // p
    if _OwnerCtx.abstract:  # structure trace: shapes only, no collectives
        return jnp.zeros((m,) + arr.shape[1:], arr.dtype)
    g = jax.lax.axis_index(axis)
    my = jax.lax.dynamic_slice_in_dim(flat_ids.astype(jnp.int32),
                                      g * m, m)
    owner = jnp.clip(my // rps, 0, p - 1)
    c = _route_capacity(m, p)
    onehot = owner[:, None] == jnp.arange(p, dtype=jnp.int32)[None, :]
    pos = jnp.take_along_axis(
        jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1,
        owner[:, None], axis=1)[:, 0]
    overflow = pos >= c
    slot = jnp.minimum(pos, c)  # overflow parks in the spare column
    buckets = jnp.full((p, c + 1), -1, jnp.int32)
    buckets = buckets.at[owner, slot].set(jnp.where(overflow, -1, my))
    req = jax.lax.all_to_all(buckets[:, :c], axis, 0, 0)  # [p, c] to serve
    loc = req - g * rps
    own = (loc >= 0) & (loc < rps) & (req >= 0)
    vals = arr[jnp.clip(loc, 0, rps - 1)]  # [p, c, ...]
    ownm = own.reshape(own.shape + (1,) * (vals.ndim - own.ndim))
    vals = jnp.where(ownm, vals, jnp.zeros((), vals.dtype))
    resp = jax.lax.all_to_all(vals, axis, 0, 0)  # [p, c, ...] answers
    out = resp[owner, jnp.minimum(pos, c - 1)]
    ofm = overflow.reshape(overflow.shape + (1,) * (out.ndim - 1))
    out = jnp.where(ofm, jnp.zeros((), out.dtype), out)

    n_over = jax.lax.psum(jnp.sum(overflow.astype(jnp.int32)), axis)

    def fallback(_):
        locf, ownf = own_rows(rps, axis, my)
        keep = (ownf & overflow).reshape(
            overflow.shape + (1,) * (out.ndim - 1))
        dense = jnp.where(keep, arr[locf], jnp.zeros((), arr.dtype))
        return jax.lax.psum(dense, axis)

    extra = jax.lax.cond(n_over > 0, fallback,
                         lambda _: jnp.zeros_like(out), None)
    return out + extra


def defer_payload(arr: Optional[jax.Array], rps: int, axis: str,
                  ids: jax.Array):
    """Owner-route a payload gather if the context allows; else None.

    Eligible: owner routing active on this axis, arr has per-row vectors
    (ndim >= 2 — the expensive leaves), and the flattened id count splits
    evenly over the axis.  Returns a :class:`Striped` marker the plan
    wrapper reassembles outside shard_map."""
    if arr is None or not owner_routing_active():
        return None
    if _OwnerCtx.axis != axis or arr.ndim < 2:
        return None
    p = _OwnerCtx.nshards
    flat = ids.reshape(-1)
    if p <= 1 or flat.shape[0] % p != 0:
        return None
    local = owner_routed_gather(arr, rps, axis, flat, p)
    return Striped(local=local, logical_shape=ids.shape + arr.shape[1:])


def own_rows(rows_per_shard: int, axis: str, ids: jax.Array):
    """(local_index, owned_mask) of global row ids under range partition."""
    if _OwnerCtx.abstract:  # structure trace: shard 0's view, no mesh
        lo = 0
    else:
        lo = jax.lax.axis_index(axis) * rows_per_shard
    loc = ids - lo
    own = (loc >= 0) & (loc < rows_per_shard)
    return jnp.clip(loc, 0, rows_per_shard - 1).astype(jnp.int32), own


def psum_owned(x: jax.Array, own: jax.Array, axis: str) -> jax.Array:
    """Zero non-owned entries and sum over the graph axis (the "stitch")."""
    m = own.reshape(own.shape + (1,) * (x.ndim - own.ndim))
    masked = jnp.where(m, x, jnp.zeros((), x.dtype))
    if _OwnerCtx.abstract:  # shapes only
        return masked
    return jax.lax.psum(masked, axis)


def row_sharded_sampler(fn):
    """Make a per-seed CSR sampler shard-transparent.

    Wraps ``fn(csr, seeds, *a, **kw) -> array | tuple`` so that when
    ``csr`` is a :class:`ShardedCSR`, each shard samples locally for the
    seeds it owns and one psum recombines (owner contributes the true
    values — including default fills — non-owners contribute zeros).
    Randomness is identical across shards (same key, same shapes), so the
    sharded result is bitwise-equal to the single-device sampler's.
    """

    @functools.wraps(fn)
    def wrapped(csr, seeds, *args, **kwargs):
        if not isinstance(csr, ShardedCSR):
            return fn(csr, seeds, *args, **kwargs)
        loc, own = own_rows(csr.rows_per_shard, csr.axis, seeds)
        out = fn(csr.local, loc, *args, **kwargs)
        if isinstance(out, tuple):
            return tuple(psum_owned(x, own, csr.axis) for x in out)
        return psum_owned(out, own, csr.axis)

    return wrapped


def sharded_row_gather(arr: Optional[jax.Array], rows_per_shard: int,
                       axis: str, ids: jax.Array) -> Optional[jax.Array]:
    """arr[ids] where ``arr`` is this shard's row block of a global array."""
    if arr is None:
        return None
    loc, own = own_rows(rows_per_shard, axis, ids)
    return psum_owned(arr[loc], own, axis)


def csr_degrees(csr, ids: jax.Array) -> jax.Array:
    """Row degrees at ``ids`` (any shape); shard-transparent.

    Backs the auto-populated per-hop degrees (reference DegreeDagNode,
    gsl/dag_node.py:71-79 + degree_getter.cc:28)."""
    from graph_learn_tpu.ops.segment import row_bounds_csr
    if isinstance(csr, ShardedCSR):
        loc, own = own_rows(csr.rows_per_shard, csr.axis, ids)
        _, _, d = row_bounds_csr(csr.local, loc)
        return psum_owned(d, own, csr.axis)
    _, _, d = row_bounds_csr(csr, ids)
    return d


def edge_field(et, name: str, edge_ids: jax.Array) -> Optional[jax.Array]:
    """Gather a per-edge field at (possibly -1-padded) edge row ids.

    Single chokepoint for compile.py's direct ``et.src[eidx]`` /
    ``et.timestamps[eids]`` accesses so they work on plain and sharded
    edge tables alike.  Invalid ids (< 0) read row 0 on the plain path
    (masked downstream) and produce zeros on the sharded path.
    """
    arr = getattr(et, name)
    if arr is None:
        return None
    idx = jnp.maximum(edge_ids, 0)
    if isinstance(et, ShardedEdgeTable):
        return sharded_row_gather(arr, et.edges_per_shard, et.axis, idx)
    return arr[idx]
