"""Online query serving: installed GSL queries answered on-device.

TPU-native equivalent of the DGS serving tier
(reference: dynamic_graph_service/ — install-query via coordinator
(fbs/query_plan.fbs, http_service.py:35-118 POST /admin/query),
ServingActor + QueryExecutor::Execute(vid) over pre-sampled RocksDB
(query_executor.h:29-44, serving_actor.act.h:29), 20ms-P99 / 20k QPS
targets docs/en/dgs/intro.md:26-29).

Redesign: there is no pre-sampling store — the compiled query plan IS the
serving function.  install() jits the plan at a fixed micro-batch size;
run() pads requests into it.  A micro-batcher amortises dispatch: at
micro-batch 256 a single chip answers hundreds of vids per plan launch.
Updates land through online/update.py and are visible at the next
``refresh()`` (table re-upload), mirroring DGS's ingest->serve staleness
window.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.errors import InvalidArgumentError
from graph_learn_tpu.gsl.compile import Query, _execute


class InstalledQuery:
    def __init__(self, service: "QueryService", qid: int, query: Query,
                 micro_batch: int):
        self.service = service
        self.qid = qid
        self.query = query
        self.micro_batch = micro_batch
        self._tables = query.device_tables()
        self._fn = jax.jit(lambda t, s, k: _execute(query, t, s, k))
        self._key = jax.random.key(conf.seed)
        self.latencies: List[float] = []
        self.served = 0

    def refresh(self):
        """Pick up applied graph updates (re-upload tables)."""
        for t in self.query.graph.store.nodes.values():
            t._device = None
        for t in self.query.graph.store.edges.values():
            t._device = None
        self._tables = self.query.device_tables()

    def run(self, ids: np.ndarray):
        """Serve a batch of raw seed ids -> {alias: value} (padded run)."""
        t0 = time.perf_counter()
        ids = np.asarray(ids, np.int64)
        src = self.query.source
        if src.kind != "source_v":
            raise InvalidArgumentError("serving expects a V() query")
        ns = self.query.graph.store.node_set(src.node_type)
        base = self.query.graph.store.node_table(ns.base_type)
        idx = base.index.lookup(ids)
        n = idx.size
        mb = self.micro_batch
        outs = []
        for off in range(0, n, mb):
            chunk = idx[off:off + mb]
            pad = mb - chunk.size
            if pad:
                chunk = np.pad(chunk, (0, pad), mode="edge")
            self._key, sub = jax.random.split(self._key)
            outs.append(self._fn(self._tables,
                                 jnp.asarray(chunk, jnp.int32), sub))
        out = outs[0] if len(outs) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        out = jax.tree.map(
            lambda x: x[:n] if hasattr(x, "shape") and x.shape
            and x.shape[0] >= n else x, out)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.latencies.append(dt)
        self.served += n
        return out

    def stats(self) -> Dict[str, float]:
        lat = np.asarray(self.latencies[1:] or self.latencies)
        if lat.size == 0:
            return {}
        return {
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            "qps": float(self.served / max(np.sum(lat), 1e-9)),
        }


class QueryService:
    """Install/run surface (coordinator /admin/query + serving workers)."""

    def __init__(self, graph):
        self.graph = graph
        self._queries: Dict[int, InstalledQuery] = {}
        self._next = 0

    def install(self, query: Query, micro_batch: int = 256) -> int:
        qid = self._next
        self._next += 1
        self._queries[qid] = InstalledQuery(self, qid, query, micro_batch)
        return qid

    def run(self, qid: int, ids) -> dict:
        return self._queries[qid].run(ids)

    def refresh(self):
        for q in self._queries.values():
            q.refresh()

    def stats(self, qid: int) -> Dict[str, float]:
        return self._queries[qid].stats()
