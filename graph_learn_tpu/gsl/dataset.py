"""Dataset: epoch iterator over a compiled GSL query.

Parity with the reference Dataset
(reference: graphlearn/python/gsl/dag_dataset.py:29-155 + the C++ prefetch
ring core/dag/dag_dataset.cc:26-70): ``next()`` returns {alias: value} per
batch and raises OutOfRangeError at epoch end.

TPU redesign: the reference's server-side proactive sampling + client pull
ring is replaced by host seed generation (cheap) + async jitted device
execution — dispatching the plan returns device futures (JAX async
dispatch), so a lookahead window of ``conf.dataset_capacity`` batches keeps
the device pipeline full while the host loop consumes.  Epoch boundaries
are preserved by queueing an EOF marker in order.

Storage tiers (``tier=`` / conf.storage_device):
- ``"device"`` (default): tables live in accelerator HBM; the whole plan
  is one on-device jitted fn — the fast path.
- ``"host"``: tables stay in host RAM (built under
  ``jax.default_device(cpu)``); the SAME jitted plan executes on the CPU
  backend and only the per-batch result pytree is device_put to the
  accelerator, overlapped by the prefetch window.  This is the
  out-of-core tier for graphs larger than HBM on a single chip — the
  reference's architecture (host-resident MemoryGraphStorage feeding the
  accelerator through the from_generator seam, nn/tf/data/dataset.py:
  226-241) recreated as a fallback; past a few chips the sharded store
  (parallel/sharded_store.py) is the faster way to hold big graphs.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.traversal import Traverser
from graph_learn_tpu.errors import OutOfRangeError
from graph_learn_tpu.gsl.compile import Query

_EOF = object()


class Dataset:
    def __init__(self, query: Query, window: Optional[int] = None,
                 seed: Optional[int] = None, drop_last: bool = False,
                 tier: Optional[str] = None,
                 device: Optional[jax.Device] = None,
                 transform=None):
        """``tier``: "device" (tables in HBM) or "host" (tables in host
        RAM, plan runs on the CPU backend, batches transfer).  ``device``:
        where host-tier batches land (default: the backend's first
        device); ignored for the device tier.  ``transform(batch, tables)
        -> batch`` runs fused into the jitted plan call — on the host
        tier it executes on the CPU backend BEFORE the transfer, so e.g.
        :func:`nn.data.pre_aggregate_hop` shrinks what crosses to the
        accelerator by the deepest fanout."""
        from graph_learn_tpu.errors import InvalidArgumentError
        self.query = query
        self.window = window if window is not None else conf.dataset_capacity
        self.drop_last = drop_last
        self.tier = tier if tier is not None else conf.storage_device
        if self.tier not in ("device", "host"):
            raise InvalidArgumentError(
                "tier must be 'device' or 'host', got %r" % (self.tier,))
        size, space = query.source_space()
        self._space = space
        src = query.source
        self._trav = Traverser(size, query.dag.batch_size,
                               strategy=src.strategy,
                               seed=conf.seed if seed is None else seed)
        if space == "node":
            ns = query.graph.store.node_set(src.node_type)
            self._seed_indices = ns.indices
        else:
            self._seed_indices = None
        if self.tier == "host":
            self._host_dev = jax.devices("cpu")[0]
            self._target_dev = device
            with jax.default_device(self._host_dev):
                self._key = jax.random.key(
                    conf.seed if seed is None else seed)
                self._tables = query.device_tables()
            # default_device only PLACES arrays; commit them so the jitted
            # plan runs on the CPU backend instead of migrating the whole
            # store to the accelerator (jit follows committed args)
            self._tables = jax.device_put(self._tables, self._host_dev)
            self._key = jax.device_put(self._key, self._host_dev)
        else:
            self._host_dev = self._target_dev = None
            self._key = jax.random.key(conf.seed if seed is None else seed)
            self._tables = query.device_tables()
        self._plan = query.build()
        if transform is not None:
            plan = self._plan
            self._call = jax.jit(
                lambda t, s, k: transform(plan(t, s, k), t))
        else:
            self._call = self._plan
        self._pending = deque()

    @property
    def epoch(self) -> int:
        return self._trav.epoch

    @property
    def batch_size(self) -> int:
        return self._trav.batch_size

    def _dispatch(self):
        while True:
            positions, count = self._trav.next()
            if self.drop_last and count < self._trav.batch_size:
                raise OutOfRangeError("No more nodes exist.")
            seeds = (self._seed_indices[positions]
                     if self._seed_indices is not None else positions)
            self._key, sub = jax.random.split(self._key)
            if self.tier == "host":
                # sample on the CPU backend from host-resident tables;
                # ship ONLY the batch to the accelerator (async — the
                # transfer overlaps inside the prefetch window)
                with jax.default_device(self._host_dev):
                    out = self._call(self._tables,
                                     jnp.asarray(seeds, jnp.int32), sub)
                tgt = self._target_dev or jax.devices()[0]
                out = jax.device_put(out, tgt)
            else:
                out = self._call(self._tables, jnp.asarray(seeds, jnp.int32),
                                 sub)
            return out, count

    def _refill(self):
        while len(self._pending) < self.window:
            try:
                self._pending.append(self._dispatch())
            except OutOfRangeError:
                self._pending.append(_EOF)
                return

    def next_with_count(self):
        """({alias: value}, true_count) — raises OutOfRangeError at epoch end."""
        if not self._pending:
            self._refill()
        item = self._pending.popleft()
        if item is _EOF:
            raise OutOfRangeError("No more nodes exist.")
        self._refill()
        return item

    def next(self):
        """One batch: {alias: Nodes/Edges/SparseNodes/SubGraphVal}.

        A ``values(func)`` post-processor set on the query is applied here
        (reference dag_node.py:302 ``values(func)`` maps the result dict).
        """
        out = self.next_with_count()[0]
        if self.query.post_func is not None:
            return self.query.post_func(out)
        return out

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return self.next()
        except OutOfRangeError:
            raise StopIteration
