"""Trainers: the training-loop surface of the framework.

Parity with the reference trainers
(reference: graphlearn/examples/tf/trainer.py — LocalTrainer:30-163 with
OutOfRange epoch handling :131-137, DistTrainer:327-371).

TPU redesign: where the reference feeds numpy batches from graph servers
into a TF session, here ONE jitted step fuses GSL sampling + attribute
gather + model forward/backward + optimizer update — there is no host
boundary inside the step.  DistTrainer's PS/worker machinery is subsumed by
pjit data parallelism (parallel/train.py).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.traversal import Traverser
from graph_learn_tpu.errors import OutOfRangeError
from graph_learn_tpu.gsl.compile import Query, _execute


class LocalTrainer:
    """Single-process trainer over a fused sample+train jitted step.

    ``loss_fn(model, params, batch, rng, training)`` -> scalar loss, where
    ``batch`` is the {alias: value} dict produced by the query plan.
    """

    def __init__(self, seed: Optional[int] = None):
        self.seed = conf.seed if seed is None else seed

    def _seed_stream(self, query: Query):
        size, space = query.source_space()
        src = query.source
        trav = Traverser(size, query.dag.batch_size, strategy=src.strategy,
                         seed=self.seed)
        if space == "node":
            idx = query.graph.store.node_set(src.node_type).indices
        else:
            idx = None
        return trav, idx

    def train(self, query: Query, model, params, loss_fn: Callable,
              optimizer: optax.GradientTransformation, epochs: int = 1,
              steps_per_epoch: Optional[int] = None,
              log_every: int = 50, verbose: bool = True,
              batch_transform: Optional[Callable] = None,
              tier: Optional[str] = None):
        """``batch_transform(batch, tables) -> batch`` (optional) runs
        inside the jitted step but OUTSIDE value_and_grad — the place for
        non-differentiated batch prep such as
        :func:`graph_learn_tpu.nn.data.pre_aggregate_hop`, whose
        out-of-grad deepest-hop reduction is worth +19% end-to-end on
        gather-bound graphs (PERF.md).

        ``tier`` (default conf.storage_device): "device" fuses sampling
        into the train step (tables in HBM); "host" keeps the graph in
        host RAM — sampling (and batch_transform) run on the CPU backend
        via a host-tier Dataset, and only the batch crosses to the
        accelerator for the jitted train step.  The out-of-core path for
        graphs larger than a single chip's HBM."""
        tier = tier if tier is not None else conf.storage_device
        if tier == "host":
            return self._train_host(query, model, params, loss_fn,
                                    optimizer, epochs, steps_per_epoch,
                                    verbose, batch_transform)
        tables = query.device_tables()
        opt_state = optimizer.init(params)
        key = jax.random.key(self.seed)

        # tables passed as an ARGUMENT: closure-captured device arrays
        # become jit constants and get serialised into (remote) compile
        # requests — gigabytes for big graphs
        @jax.jit
        def step(params, opt_state, tables, seeds, key):
            ks, km = jax.random.split(key)
            batch = _execute(query, tables, seeds, ks)
            if batch_transform is not None:
                batch = batch_transform(batch, tables)

            def lf(p):
                return loss_fn(model, p, batch, km, True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        trav, idx = self._seed_stream(query)
        if trav.strategy == "random" and steps_per_epoch is None:
            raise ValueError("a 'random' (shuffle()) source never exhausts an "
                             "epoch; pass steps_per_epoch")
        history = []
        it = 0
        t0 = time.time()
        for epoch in range(epochs):
            losses = []
            ep_steps = 0
            while steps_per_epoch is None or ep_steps < steps_per_epoch:
                try:
                    pos, _ = trav.next()
                except OutOfRangeError:
                    break
                ep_steps += 1
                seeds = idx[pos] if idx is not None else pos
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(
                    params, opt_state, tables, jnp.asarray(seeds, jnp.int32),
                    sub)
                losses.append(loss)
                it += 1
            mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            history.append(mean_loss)
            if verbose:
                dt = time.time() - t0
                print("epoch %d loss %.4f (%.1f steps/s)"
                      % (epoch, mean_loss, it / max(dt, 1e-9)))
        return params, history

    def _train_host(self, query, model, params, loss_fn, optimizer,
                    epochs, steps_per_epoch, verbose, batch_transform):
        """Host-tier loop: Dataset(tier='host') samples on CPU, the
        jitted step trains on the accelerator from the shipped batch —
        the reference's own architecture (host graph servers feeding the
        training device, SURVEY §3.3 from_generator seam)."""
        from graph_learn_tpu.gsl.dataset import Dataset
        ds = Dataset(query, seed=self.seed, transform=batch_transform,
                     tier="host")
        if ds._trav.strategy == "random" and steps_per_epoch is None:
            raise ValueError("a 'random' (shuffle()) source never exhausts "
                             "an epoch; pass steps_per_epoch")
        opt_state = optimizer.init(params)
        key = jax.random.key(self.seed)

        @jax.jit
        def step(params, opt_state, batch, key):
            def lf(p):
                return loss_fn(model, p, batch, key, True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        history = []
        it = 0
        t0 = time.time()
        for epoch in range(epochs):
            losses = []
            ep_steps = 0
            while steps_per_epoch is None or ep_steps < steps_per_epoch:
                try:
                    batch, _ = ds.next_with_count()
                except OutOfRangeError:
                    break
                ep_steps += 1
                key, sub = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, sub)
                losses.append(loss)
                it += 1
            mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
            history.append(mean_loss)
            if verbose:
                dt = time.time() - t0
                print("epoch %d loss %.4f (%.1f steps/s, host tier)"
                      % (epoch, mean_loss, it / max(dt, 1e-9)))
        return params, history

    def evaluate(self, query: Query, model, params,
                 metric_fn: Callable,
                 batch_transform: Optional[Callable] = None,
                 tier: Optional[str] = None) -> float:
        """metric_fn(model, params, batch) -> per-row metric values [b].

        A padded final batch only counts its first n_valid rows (the
        Traverser pads circularly, so the tail rows are duplicates).
        """
        tier = tier if tier is not None else conf.storage_device
        if tier == "host":
            from graph_learn_tpu.gsl.dataset import Dataset
            ds = Dataset(query, seed=self.seed + 1,
                         transform=batch_transform, tier="host")
            evj = jax.jit(partial(metric_fn, model))
            total, count = 0.0, 0
            while True:
                try:
                    batch, n_valid = ds.next_with_count()
                except OutOfRangeError:
                    break
                vals = np.asarray(evj(params, batch))
                total += float(vals[:n_valid].sum())
                count += n_valid
            return total / max(count, 1)
        tables = query.device_tables()
        key = jax.random.key(self.seed + 1)

        @jax.jit
        def ev(params, tables, seeds, key):
            batch = _execute(query, tables, seeds, key)
            if batch_transform is not None:
                batch = batch_transform(batch, tables)
            return metric_fn(model, params, batch)

        trav, idx = self._seed_stream(query)
        total, count = 0.0, 0
        while True:
            try:
                pos, n_valid = trav.next()
            except OutOfRangeError:
                break
            seeds = idx[pos] if idx is not None else pos
            key, sub = jax.random.split(key)
            vals = np.asarray(ev(params, tables,
                                 jnp.asarray(seeds, jnp.int32), sub))
            total += float(vals[:n_valid].sum())
            count += n_valid
        return total / max(count, 1)
