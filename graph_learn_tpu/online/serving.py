"""Online query serving: installed GSL queries answered on-device.

TPU-native equivalent of the DGS serving tier
(reference: dynamic_graph_service/ — install-query via coordinator
(fbs/query_plan.fbs, http_service.py:35-118 POST /admin/query),
ServingActor + QueryExecutor::Execute(vid) over pre-sampled RocksDB
(query_executor.h:29-44, serving_actor.act.h:29), 20ms-P99 / 20k QPS
targets docs/en/dgs/intro.md:26-29).

Redesign: there is no pre-sampling store — the compiled query plan IS the
serving function.  install() jits the plan at a fixed micro-batch size;
concurrent callers are coalesced onto shared device launches:

- **Coalescing**: each installed query owns a dispatcher thread.  Callers
  (one per HTTP connection) enqueue raw ids and block; the dispatcher
  drains every pending request into one padded micro-batch, launches the
  plan once, and slices the result back per caller.  This is the device
  analogue of DGS's per-shard actor mailbox (serving_actor.act.h:29) —
  concurrency buys batch occupancy instead of queueing delay.
- **Copy-on-write snapshots**: a request is served entirely against one
  immutable (id-index, device-tables) snapshot captured at dispatch time.
  ``refresh()`` builds the next snapshot while old-snapshot requests keep
  flowing, then swaps it in atomically — updates never stall reads
  (DGS equivalent: RocksDB snapshot isolation under DataUpdateActor
  ingest, data_update_actor.act.h:29).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.errors import InvalidArgumentError, NotFoundError
from graph_learn_tpu.gsl.compile import Query, _execute

_SHUTDOWN = object()


class _Snapshot:
    """Immutable view a request is served against: host id-index + device
    tables captured together (so a concurrent table rebuild can never remap
    rows under an in-flight request).

    On a partitioned service the snapshot holds the graph-axis-sharded
    store and ITS compiled plan (the plan closes over the placed shards,
    so swapping a snapshot swaps both atomically)."""

    __slots__ = ("index", "tables", "plan")

    def __init__(self, index, tables, plan=None):
        self.index = index
        self.tables = tables
        self.plan = plan


class _Pending:
    __slots__ = ("ids", "event", "result", "error", "t0")

    def __init__(self, ids: np.ndarray):
        self.ids = ids
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t0 = time.perf_counter()


class InstalledQuery:
    def __init__(self, service: "QueryService", qid: int, query: Query,
                 micro_batch: int):
        self.service = service
        self.qid = qid
        self.query = query
        self.micro_batch = micro_batch
        self._mesh = service.mesh
        self._graph_shards = service.graph_shards
        src = query.source
        if src.kind != "source_v":
            raise InvalidArgumentError("serving expects a V() query")
        # SubGraph outputs are NOT seed-aligned (node_ids is a dedup-union
        # over the whole merged batch, edge_index is [2, E_cap]) — slicing
        # them by per-caller seed offsets would hand one client data
        # induced from another client's seeds.  Detect at install time and
        # serve such queries one launch per request, unsliced.
        self._seed_aligned = not any(
            n.kind == "subgraph" for n in query.dag.nodes)
        self._fn = jax.jit(lambda t, s, k: _execute(query, t, s, k))
        self._plan_fn = None  # shared compiled partitioned plan
        self._plan_sig = None
        self._key = jax.random.key(conf.seed)
        self._snap = self._build_snapshot()
        self.latencies: List[float] = []
        self.served = 0
        self._first_t: Optional[float] = None
        self._last_t: Optional[float] = None
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._worker = threading.Thread(
            target=self._serve_loop, name=f"glt-serve-q{qid}", daemon=True)
        self._worker.start()

    # -- snapshot lifecycle ------------------------------------------------
    def _build_snapshot(self, prev: Optional[_Snapshot] = None) -> _Snapshot:
        ns = self.query.graph.store.node_set(self.query.source.node_type)
        base = self.query.graph.store.node_table(ns.base_type)
        if self._graph_shards > 1:
            # partitioned serving (DGS partitions sample storage by vid
            # across serving workers, sample_store.h:71): every device
            # holds 1/P of the graph payload, so the SERVED graph scales
            # with device count.  Streaming updates land via refresh() as
            # an INCREMENTAL per-shard delta upload: the new host blocks
            # are diffed against the previous snapshot's and only touched
            # shard blocks transfer (ShardedTables.replace_blocks; tail
            # capacity from conf.serving_shard_slack keeps layouts stable
            # under appends).  Layout overflow falls back to a full
            # upload per leaf — always correct.
            from graph_learn_tpu.parallel.sharded_store import \
                build_sharded_tables
            from graph_learn_tpu.parallel.train import make_partitioned_plan
            stables = build_sharded_tables(
                self.query, self._graph_shards,
                slack=conf.serving_shard_slack)
            if (prev is not None and prev.tables is not None
                    and getattr(prev.tables, "host_stacked", None)
                    is not None):
                placed, up = prev.tables.replace_blocks(stables)
                self.last_refresh_upload_bytes = up
            else:
                placed = stables.place(self._mesh)
                self.last_refresh_upload_bytes = sum(
                    x.nbytes for x in jax.tree.leaves(stables.stacked))
            # ONE compiled plan per installed query: the tables enter as
            # jit ARGUMENTS, so a refresh that keeps block layouts stable
            # (the slack's job) reuses the compiled executable — no
            # retrace, no recompile, just new device buffers
            sig = self._tables_sig(placed)
            if self._plan_fn is None or sig != self._plan_sig:
                plan = make_partitioned_plan(self.query, self._mesh,
                                             placed)
                self._plan_fn = jax.jit(
                    lambda st, rp, s, k: plan(s, k, stacked=st, repl=rp))
                self._plan_sig = sig
            return _Snapshot(base.index, placed, self._plan_fn)
        return _Snapshot(base.index, self.query.device_tables())

    @staticmethod
    def _tables_sig(placed):
        leaves, treedef = jax.tree.flatten((placed.stacked, placed.repl))
        return (treedef,
                tuple((x.shape, str(x.dtype)) for x in leaves))

    def refresh(self):
        """Pick up applied graph updates.

        Builds the next snapshot (host index + device delta upload) while
        requests continue against the current one, then swaps atomically
        — in-flight requests keep their captured snapshot (unchanged
        shard buffers are shared between snapshots; all immutable).
        """
        for t in self.query.graph.store.nodes.values():
            t._device = {}
        for t in self.query.graph.store.edges.values():
            t._device = {}
        self._snap = self._build_snapshot(prev=self._snap)

    def close(self):
        self._queue.put(_SHUTDOWN)
        self._worker.join(timeout=5)

    # -- request path ------------------------------------------------------
    def run(self, ids: np.ndarray):
        """Serve raw seed ids -> {alias: value}.  Thread-safe; concurrent
        callers are coalesced into shared device launches."""
        p = _Pending(np.asarray(ids, np.int64).reshape(-1))
        self._queue.put(p)
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    def _serve_loop(self):
        while self._serve_once():
            pass

    def _serve_once(self) -> bool:
        """One dispatcher round: drain pending requests -> one launch."""
        first = self._queue.get()
        if first is _SHUTDOWN:
            return False
        batch = [first]
        total = first.ids.size
        # drain everything already queued — one launch serves them all
        # (seed-aligned outputs only; subGraph queries can't be sliced
        # back per caller, so they get a dedicated launch each)
        while self._seed_aligned and total < self.micro_batch:
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is _SHUTDOWN:
                self._queue.put(_SHUTDOWN)
                break
            batch.append(nxt)
            total += nxt.ids.size
        # anchor the QPS window at the START of the first round so a
        # single round reports work/duration, not work/epsilon
        if self._first_t is None:
            self._first_t = time.perf_counter()
        ok = False
        try:
            out = self._execute_batch(
                np.concatenate([p.ids for p in batch]))
            if not self._seed_aligned:
                batch[0].result = out  # single request, no slicing
            else:
                off = 0
                for p in batch:
                    ln = p.ids.size
                    lo = off
                    p.result = jax.tree.map(
                        lambda x: x[lo:lo + ln]
                        if hasattr(x, "shape") and x.shape else x, out)
                    off += ln
            ok = True
        except BaseException as e:  # deliver, don't kill the worker
            for p in batch:
                p.error = e
        now = time.perf_counter()
        self._last_t = now
        for p in batch:
            if ok:  # failed requests don't count as served work
                self.latencies.append(now - p.t0)
                self.served += p.ids.size
            p.event.set()
        return True

    def _launch(self, snap: _Snapshot, seeds, sub):
        """One device launch against a snapshot (single-chip jit plan or
        the shared partitioned plan fed the snapshot's table buffers)."""
        if snap.plan is not None:
            with jax.set_mesh(self._mesh):
                return snap.plan(snap.tables.stacked, snap.tables.repl,
                                 seeds, sub)
        return self._fn(snap.tables, seeds, sub)

    def _execute_batch(self, ids: np.ndarray):
        snap = self._snap  # one immutable snapshot for the whole request
        idx = snap.index.lookup(ids)
        n = idx.size
        mb = self.micro_batch
        if not self._seed_aligned:
            # SubGraph outputs can't be concatenated across chunks (the
            # node union / edge_index are batch-global), and edge-padding
            # the seed list is harmless: induction is over the seed SET.
            if n > mb:
                raise InvalidArgumentError(
                    "subGraph serving request of %d ids exceeds the "
                    "installed micro_batch %d; install with a larger "
                    "micro_batch or split the request" % (n, mb))
            chunk = np.pad(idx, (0, mb - n), mode="edge") if n < mb else idx
            self._key, sub = jax.random.split(self._key)
            out = self._launch(snap, jnp.asarray(chunk, jnp.int32), sub)
            # trim the padding off seed-aligned aliases only; SubGraphVal
            # aliases keep their batch-global (capped) shapes
            from graph_learn_tpu.core.values import SubGraphVal
            out = {a: v if isinstance(v, SubGraphVal) else jax.tree.map(
                lambda x: x[:n] if hasattr(x, "shape") and x.shape
                and x.shape[0] >= n else x, v)
                for a, v in out.items()}
            jax.block_until_ready(out)
            return out
        outs = []
        for off in range(0, n, mb):
            chunk = idx[off:off + mb]
            pad = mb - chunk.size
            if pad:
                chunk = np.pad(chunk, (0, pad), mode="edge")
            self._key, sub = jax.random.split(self._key)
            outs.append(self._launch(snap, jnp.asarray(chunk, jnp.int32),
                                     sub))
        out = outs[0] if len(outs) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        out = jax.tree.map(
            lambda x: x[:n] if hasattr(x, "shape") and x.shape
            and x.shape[0] >= n else x, out)
        jax.block_until_ready(out)
        return out

    def stats(self) -> Dict[str, float]:
        lat = np.asarray(self.latencies[1:] or self.latencies)
        if lat.size == 0:
            return {}
        wall = max((self._last_t or 0) - (self._first_t or 0), 1e-9)
        return {
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            # QPS over the serving wall-clock window — honest under
            # concurrent clients (sum-of-latencies would overcount)
            "qps": float(self.served / wall),
        }


class InstalledModel:
    """An exported sample+forward program served by name.

    The role the reference splits between DGS (query serving) and an
    external TF-serving fleet fed by the Java client's predict module
    (reference: gsl_client/.../predict/, examples/tf/serving/
    export_serving_model.py): here the WHOLE program — GSL sampling +
    feature encode + model forward — is ONE exported StableHLO artifact
    (online/export.py) with signature ``call(seeds:int32[b], key)``, so
    the worker answers model predictions without any Python model code.
    """

    def __init__(self, name: str, artifact):
        from graph_learn_tpu.online.export import load_serving_exported
        self.name = name
        exp = load_serving_exported(artifact)
        self._call = exp.call
        self.batch = int(exp.in_avals[0].shape[0])

    def predict(self, ids, seed: int = 0):
        import jax

        ids = np.asarray(ids, np.int32)
        if ids.size == 0 or ids.size > self.batch:
            raise InvalidArgumentError(
                "predict takes 1..%d ids (the exported batch size), got %d"
                % (self.batch, ids.size))
        n = ids.size
        padded = np.concatenate(
            [ids, np.full(self.batch - n, ids[0], np.int32)])
        out = self._call(jnp.asarray(padded), jax.random.key(seed))
        # trim any leading batch axis back to the requested ids
        return jax.tree.map(
            lambda x: np.asarray(x[:n]) if getattr(x, "ndim", 0) >= 1
            and x.shape[0] == self.batch else np.asarray(x), out)


class QueryService:
    """Install/run surface (coordinator /admin/query + serving workers).

    With ``graph_shards > 1`` (and a mesh carrying a 'graph' axis) every
    installed query serves from the range-partitioned store — per-device
    HBM holds 1/P of the graph, so the servable graph scales with device
    count like DGS's vid-partitioned sample store (sample_store.h:71,
    common/partitioner.h).
    """

    def __init__(self, graph, mesh=None, graph_shards: int = 1):
        self.graph = graph
        self.graph_shards = graph_shards
        if graph_shards > 1 and mesh is None:
            from graph_learn_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n_data=1, n_graph=graph_shards)
        self.mesh = mesh
        self._queries: Dict[int, InstalledQuery] = {}
        self._models: Dict[str, InstalledModel] = {}
        self._next = 0

    def install(self, query: Query, micro_batch: int = 256) -> int:
        qid = self._next
        self._next += 1
        self._queries[qid] = InstalledQuery(self, qid, query, micro_batch)
        return qid

    def install_model(self, name: str, artifact) -> InstalledModel:
        m = InstalledModel(name, artifact)
        self._models[name] = m
        return m

    def predict(self, name: str, ids, seed: int = 0):
        if name not in self._models:
            raise NotFoundError("unknown model %r" % name)
        return self._models[name].predict(ids, seed=seed)

    def run(self, qid: int, ids) -> dict:
        return self._queries[qid].run(ids)

    def refresh(self):
        for q in self._queries.values():
            q.refresh()

    def stats(self, qid: int) -> Dict[str, float]:
        return self._queries[qid].stats()

    def close(self):
        for q in self._queries.values():
            q.close()
        self._queries.clear()
