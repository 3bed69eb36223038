"""KNN over node float attributes: Flat and IVF-Flat indexes.

Parity with the reference KNN contrib
(reference: graphlearn/src/contrib/knn/ — index.h:25-56 Train/Add/Search
API, flat_index.cc, ivfflat_index.cc + GPU mirrors via faiss,
python/operator/knn_operator.py, Graph.search graph.py:1054-1057;
KnnMetric flag 0=L2 1=inner product, include/config.h).

TPU redesign: brute-force (Flat) search IS a matmul + top-k — exactly what
the MXU is for; faiss-style cell-probing (IVFFlat) keeps the matmul but
restricts it to nprobe clusters.  No C++/faiss needed: the index is device
arrays, queries are jitted.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf


@dataclasses.dataclass
class KnnOption:
    """Parity: reference KnnOption (index type / k / metric)."""

    k: int = 10
    index_type: str = "flat"  # flat | ivfflat
    nlist: int = 64  # IVF cells
    nprobe: int = 8
    metric: Optional[int] = None  # 0=L2, 1=inner product; None -> conf


def _scores(queries: jax.Array, data: jax.Array, metric: int) -> jax.Array:
    """[m, n] similarity (higher = closer)."""
    ip = jnp.dot(queries, data.T, preferred_element_type=jnp.float32)
    if metric == 1:  # inner product
        return ip
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    dn = jnp.sum(data * data, axis=1)[None, :]
    return -(qn - 2.0 * ip + dn)  # negative squared L2


class FlatIndex:
    """Brute-force index (flat_index.cc / gpu_flat_index.cc)."""

    def __init__(self, dim: int, metric: Optional[int] = None):
        self.dim = dim
        self.metric = conf.knn_metric if metric is None else metric
        self._data: Optional[jax.Array] = None
        self._ids: Optional[jax.Array] = None

    def train(self, data: np.ndarray):  # flat needs no training
        pass

    def add(self, data: np.ndarray, ids: np.ndarray):
        d = jnp.asarray(data, jnp.float32)
        i = jnp.asarray(ids, jnp.int64)
        if self._data is None:
            self._data, self._ids = d, i
        else:
            self._data = jnp.concatenate([self._data, d])
            self._ids = jnp.concatenate([self._ids, i])

    @property
    def ntotal(self):
        return 0 if self._data is None else self._data.shape[0]

    def search(self, queries: np.ndarray, k: int):
        """-> (ids [m, k] int64 (-1 padded), distances [m, k])."""
        q = jnp.asarray(queries, jnp.float32)
        s = _scores(q, self._data, self.metric)
        kk = min(k, self.ntotal)
        top, idx = jax.lax.top_k(s, kk)
        ids = self._ids[idx]
        dist = -top if self.metric == 0 else top
        if kk < k:
            pad = k - kk
            ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            dist = jnp.pad(dist, ((0, 0), (0, pad)),
                           constant_values=jnp.inf if self.metric == 0 else -jnp.inf)
        return np.asarray(ids), np.asarray(dist)


class IVFFlatIndex:
    """Cell-probed index (ivfflat_index.cc): k-means cells + nprobe search."""

    def __init__(self, dim: int, nlist: int = 64, nprobe: int = 8,
                 metric: Optional[int] = None, iters: int = 10, seed: int = 0):
        self.dim = dim
        self.nlist = nlist
        self.nprobe = min(nprobe, nlist)
        self.metric = conf.knn_metric if metric is None else metric
        self.iters = iters
        self.seed = seed
        self.centroids: Optional[jax.Array] = None
        self._data = None
        self._ids = None
        self._cell: Optional[jax.Array] = None  # cell id per vector

    def train(self, data: np.ndarray):
        """k-means (Lloyd) on device."""
        x = jnp.asarray(data, jnp.float32)
        n = x.shape[0]
        key = jax.random.key(self.seed)
        init = x[jax.random.choice(key, n, (self.nlist,), replace=n < self.nlist)]

        def step(c, _):
            d = _scores(x, c, 0)  # [n, nlist] -L2
            assign = jnp.argmax(d, axis=1)
            sums = jax.ops.segment_sum(x, assign, num_segments=self.nlist)
            cnt = jax.ops.segment_sum(jnp.ones((n,)), assign,
                                      num_segments=self.nlist)
            newc = jnp.where(cnt[:, None] > 0,
                             sums / jnp.maximum(cnt, 1.0)[:, None], c)
            return newc, None

        self.centroids, _ = jax.lax.scan(step, init, None, length=self.iters)

    def add(self, data: np.ndarray, ids: np.ndarray):
        assert self.centroids is not None, "train() first"
        x = jnp.asarray(data, jnp.float32)
        assign = jnp.argmax(_scores(x, self.centroids, 0), axis=1)
        if self._data is None:
            self._data = x
            self._ids = jnp.asarray(ids, jnp.int64)
            self._cell = assign
        else:
            self._data = jnp.concatenate([self._data, x])
            self._ids = jnp.concatenate([self._ids, jnp.asarray(ids, jnp.int64)])
            self._cell = jnp.concatenate([self._cell, assign])

    @property
    def ntotal(self):
        return 0 if self._data is None else self._data.shape[0]

    def search(self, queries: np.ndarray, k: int):
        q = jnp.asarray(queries, jnp.float32)
        cell_scores = _scores(q, self.centroids, self.metric)
        _, probe = jax.lax.top_k(cell_scores, self.nprobe)  # [m, nprobe]
        # mask: keep data points whose cell is probed for this query
        in_probe = jnp.any(self._cell[None, :, None] ==
                           probe[:, None, :], axis=-1)  # [m, n]
        s = _scores(q, self._data, self.metric)
        s = jnp.where(in_probe, s, -jnp.inf)
        kk = min(k, self.ntotal)
        top, idx = jax.lax.top_k(s, kk)
        ids = jnp.where(jnp.isfinite(top), self._ids[idx], -1)
        dist = -top if self.metric == 0 else top
        if kk < k:
            ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
            dist = jnp.pad(dist, ((0, 0), (0, k - kk)),
                           constant_values=jnp.inf if self.metric == 0 else -jnp.inf)
        return np.asarray(ids), np.asarray(dist)


class IVFPQIndex:
    """IVF + product quantisation (ivfpq_index.cc / gpu_ivfpq_index.cc).

    Residuals vs the coarse centroid are PQ-encoded (m subspaces x ksub
    codes); search uses asymmetric distance computation: per-query LUTs
    [m, ksub] then a code-indexed sum — the LUT build is a batched matmul
    on the MXU, the ADC sum a gather+reduce.
    """

    def __init__(self, dim: int, nlist: int = 64, nprobe: int = 8,
                 m: int = 4, ksub: int = 64, metric: Optional[int] = None,
                 iters: int = 10, seed: int = 0):
        assert dim % m == 0, "dim must divide into m subspaces"
        self.dim, self.m, self.ksub = dim, m, ksub
        self.dsub = dim // m
        self.metric = conf.knn_metric if metric is None else metric
        self.coarse = IVFFlatIndex(dim, nlist=nlist, nprobe=nprobe,
                                   metric=0, iters=iters, seed=seed)
        self.codebooks: Optional[jax.Array] = None  # [m, ksub, dsub]
        self.codes: Optional[jax.Array] = None  # [n, m] uint8-ish int32
        self._ids = None
        self._cell = None
        self.seed = seed
        self.iters = iters

    def train(self, data: np.ndarray):
        x = jnp.asarray(data, jnp.float32)
        self.coarse.train(x)
        assign = jnp.argmax(_scores(x, self.coarse.centroids, 0), axis=1)
        resid = x - self.coarse.centroids[assign]
        books = []
        for s in range(self.m):
            sub = resid[:, s * self.dsub:(s + 1) * self.dsub]
            key = jax.random.key(self.seed + 1 + s)
            init = sub[jax.random.choice(key, sub.shape[0], (self.ksub,),
                                         replace=sub.shape[0] < self.ksub)]

            def step(c, _):
                a = jnp.argmax(_scores(sub, c, 0), axis=1)
                sums = jax.ops.segment_sum(sub, a, num_segments=self.ksub)
                cnt = jax.ops.segment_sum(jnp.ones((sub.shape[0],)), a,
                                          num_segments=self.ksub)
                return jnp.where(cnt[:, None] > 0,
                                 sums / jnp.maximum(cnt, 1.0)[:, None], c), None

            book, _ = jax.lax.scan(step, init, None, length=self.iters)
            books.append(book)
        self.codebooks = jnp.stack(books)  # [m, ksub, dsub]

    def add(self, data: np.ndarray, ids: np.ndarray):
        x = jnp.asarray(data, jnp.float32)
        assign = jnp.argmax(_scores(x, self.coarse.centroids, 0), axis=1)
        resid = x - self.coarse.centroids[assign]
        codes = []
        for s in range(self.m):
            sub = resid[:, s * self.dsub:(s + 1) * self.dsub]
            codes.append(jnp.argmax(_scores(sub, self.codebooks[s], 0),
                                    axis=1))
        codes = jnp.stack(codes, axis=1).astype(jnp.int32)  # [n, m]
        ids = jnp.asarray(ids, jnp.int64)
        if self.codes is None:
            self.codes, self._ids, self._cell = codes, ids, assign
        else:
            self.codes = jnp.concatenate([self.codes, codes])
            self._ids = jnp.concatenate([self._ids, ids])
            self._cell = jnp.concatenate([self._cell, assign])

    @property
    def ntotal(self):
        return 0 if self.codes is None else self.codes.shape[0]

    def search(self, queries: np.ndarray, k: int):
        q = jnp.asarray(queries, jnp.float32)
        nq = q.shape[0]
        cs = _scores(q, self.coarse.centroids, 0)  # [nq, nlist] -L2
        _, probe = jax.lax.top_k(cs, self.coarse.nprobe)
        # ADC with per-probed-cell residual LUTs: residual of q vs EACH
        # probed centroid; a point is scored with the LUT of its own cell.
        P = self.coarse.nprobe
        resid = q[:, None, :] - self.coarse.centroids[probe]  # [nq, P, dim]
        rs = resid.reshape(nq, P, self.m, self.dsub)
        diff = rs[:, :, :, None, :] - self.codebooks[None, None]
        lut = -jnp.sum(diff * diff, axis=-1)  # [nq, P, m, ksub]
        oh = jax.nn.one_hot(self.codes, self.ksub)  # [n, m, ksub]
        scores_p = jnp.einsum("qpms,nms->qpn", lut, oh)  # [nq, P, n]
        match = (self._cell[None, None, :] == probe[:, :, None])  # [nq, P, n]
        s = jnp.max(jnp.where(match, scores_p, -jnp.inf), axis=1)  # [nq, n]
        kk = min(k, self.ntotal)
        top, idx = jax.lax.top_k(s, kk)
        ids = jnp.where(jnp.isfinite(top), self._ids[idx], -1)
        dist = -top
        if kk < k:
            ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
            dist = jnp.pad(dist, ((0, 0), (0, k - kk)),
                           constant_values=jnp.inf)
        return np.asarray(ids), np.asarray(dist)


def build_index(data: np.ndarray, ids: np.ndarray,
                option: KnnOption):
    """IndexFactory equivalent (index_factory.cc)."""
    dim = data.shape[1]
    if option.index_type == "flat":
        index = FlatIndex(dim, metric=option.metric)
    elif option.index_type == "ivfflat":
        index = IVFFlatIndex(dim, nlist=option.nlist, nprobe=option.nprobe,
                             metric=option.metric)
    elif option.index_type == "ivfpq":
        index = IVFPQIndex(dim, nlist=option.nlist, nprobe=option.nprobe,
                           metric=option.metric)
    else:
        raise ValueError("unknown index type %r" % option.index_type)
    index.train(data)
    index.add(data, ids)
    return index


# --- distributed KNN over the mesh "graph" axis -------------------------

class ShardedIndex:
    """Graph-axis-distributed KNN: per-shard search + merged top-k.

    Reference: KnnOperator is a RemoteOperator — each server searches its
    own partition's index and the results are merged
    (graphlearn/src/contrib/knn/knn_op.h:27-40, knn_op.cc:52).  TPU
    redesign as ONE SPMD program: coarse structures (IVF centroids, PQ
    codebooks) are trained globally and REPLICATED (they are
    nlist/ksub-sized), per-point arrays (vectors, codes, cell
    assignments) are range-partitioned over the mesh "graph" axis; each
    shard computes its local top-k and one all_gather + ascending-row
    re-top-k merges EXACTLY to the single-device answer (``lax.top_k``
    tie-breaks toward the lower index, and global data-row order is
    preserved across range-partitioned shards).
    """

    def __init__(self, base, mesh, axis: str = "graph"):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        self.base = base
        self.mesh = mesh
        self.axis = axis
        p = mesh.shape[axis]
        self.nshards = p
        n = base.ntotal
        self.rps = rps = max(-(-n // p), 1)

        def stack(a, pad_value=0.0):
            a = np.asarray(a)
            padded = np.full((p * rps,) + a.shape[1:], pad_value, a.dtype)
            padded[:n] = a
            return jnp.asarray(padded.reshape((p, rps) + a.shape[1:]))

        stacked = {"valid": stack(np.ones(n, bool), False)}
        repl = {}
        kind = type(base).__name__
        if kind == "FlatIndex":
            stacked["data"] = stack(base._data)
            self._kind = "flat"
        elif kind == "IVFFlatIndex":
            stacked["data"] = stack(base._data)
            stacked["cell"] = stack(base._cell, -1)
            repl["centroids"] = base.centroids
            self._kind = "ivfflat"
        elif kind == "IVFPQIndex":
            stacked["codes"] = stack(base.codes)
            stacked["cell"] = stack(base._cell, -1)
            repl["centroids"] = base.coarse.centroids
            repl["codebooks"] = base.codebooks
            self._kind = "ivfpq"
        else:
            raise ValueError("cannot shard index type %s" % kind)
        self.stacked = jax.device_put(stacked, NamedSharding(mesh, P(axis)))
        self.repl = jax.device_put(repl, NamedSharding(mesh, P()))
        self._jit_cache = {}

    @property
    def ntotal(self):
        return self.base.ntotal

    def _local_scores(self, q, blk, repl):
        """[m, rps] scores of this shard's rows under the base formulas."""
        base, kind = self.base, self._kind
        if kind == "flat":
            return _scores(q, blk["data"], base.metric)
        if kind == "ivfflat":
            cs = _scores(q, repl["centroids"], base.metric)
            _, probe = jax.lax.top_k(cs, base.nprobe)  # replicated
            in_probe = jnp.any(blk["cell"][None, :, None] ==
                               probe[:, None, :], axis=-1)
            s = _scores(q, blk["data"], base.metric)
            return jnp.where(in_probe, s, -jnp.inf)
        # ivfpq: ADC with replicated codebooks over the local code block
        nq = q.shape[0]
        cs = _scores(q, repl["centroids"], 0)
        _, probe = jax.lax.top_k(cs, base.coarse.nprobe)
        Pn = base.coarse.nprobe
        resid = q[:, None, :] - repl["centroids"][probe]
        rs = resid.reshape(nq, Pn, base.m, base.dsub)
        diff = rs[:, :, :, None, :] - repl["codebooks"][None, None]
        lut = -jnp.sum(diff * diff, axis=-1)  # [nq, P, m, ksub]
        oh = jax.nn.one_hot(blk["codes"], base.ksub)  # [rps, m, ksub]
        scores_p = jnp.einsum("qpms,nms->qpn", lut, oh)
        match = blk["cell"][None, None, :] == probe[:, :, None]
        return jnp.max(jnp.where(match, scores_p, -jnp.inf), axis=1)

    def _build_search(self, m: int, k: int):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        axis, rps, p = self.axis, self.rps, self.nshards
        kk = min(k, rps)

        def body(stacked, repl, q):
            blk = jax.tree.map(lambda x: x[0], stacked)
            s = self._local_scores(q, blk, repl)
            s = jnp.where(blk["valid"][None, :], s, -jnp.inf)
            top, idx = jax.lax.top_k(s, kk)
            rows = idx + jax.lax.axis_index(axis) * rps
            if kk < k:
                top = jnp.pad(top, ((0, 0), (0, k - kk)),
                              constant_values=-jnp.inf)
                rows = jnp.pad(rows, ((0, 0), (0, k - kk)),
                               constant_values=2**31 - 1)
            gt = jax.lax.all_gather(top, axis)    # [p, m, k]
            gr = jax.lax.all_gather(rows, axis)
            cand_s = jnp.transpose(gt, (1, 0, 2)).reshape(m, p * k)
            cand_r = jnp.transpose(gr, (1, 0, 2)).reshape(m, p * k)
            # ascending-global-row order reproduces the single-device
            # tie-break (top_k prefers the lower index); padding rows
            # carry -inf scores and park at the id-space end
            sort_key = jnp.where(jnp.isfinite(cand_s), cand_r, 2**31 - 1)
            order = jnp.argsort(sort_key, axis=-1)
            s2 = jnp.take_along_axis(cand_s, order, axis=-1)
            r2 = jnp.take_along_axis(cand_r, order, axis=-1)
            top2, pos = jax.lax.top_k(s2, k)
            rows2 = jnp.take_along_axis(r2, pos, axis=-1)
            return top2, rows2

        fn = shard_map(body, mesh=self.mesh,
                       in_specs=(P(axis), P(), P()), out_specs=P(),
                       check_vma=False)
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int):
        """-> (ids [m, k], distances [m, k]) — equal to base.search."""
        q = jnp.asarray(queries, jnp.float32)
        m = q.shape[0]
        ck = (m, k)
        if ck not in self._jit_cache:
            self._jit_cache[ck] = self._build_search(m, k)
        with jax.set_mesh(self.mesh):
            top, rows = self._jit_cache[ck](self.stacked, self.repl, q)
        top = np.asarray(top)
        rows = np.asarray(rows)
        valid = np.isfinite(top)
        base_ids = np.asarray(self.base._ids)
        ids = np.where(valid, base_ids[np.where(valid, rows, 0)], -1)
        # ivfpq scores are ADC L2 regardless of the metric flag (the base
        # index's behavior, mirrored for exact equality)
        if self._kind == "ivfpq" or self.base.metric == 0:
            dist = np.where(valid, -top, np.inf)
        else:
            dist = np.where(valid, top, -np.inf)
        return ids, dist


def shard_index(index, mesh, axis: str = "graph") -> ShardedIndex:
    """Distribute a built index over the mesh graph axis (IndexManager +
    RemoteOperator equivalent, knn_op.cc:52)."""
    return ShardedIndex(index, mesh, axis=axis)
