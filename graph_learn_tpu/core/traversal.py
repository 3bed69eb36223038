"""Host-side seed traversal: by_order / shuffle / random epoch generators.

Parity with the reference's seed-set generators
(reference: graphlearn/src/core/operator/graph/node_getter.cc:51-140,
edge_getter.cc:25, node_generator.h / edge_generator.h):

- ``by_order``: sequential over the set; a partial final batch is returned,
  the following pull raises OutOfRangeError and resets for the next epoch.
- ``shuffle``: same epoch semantics over a fresh permutation per epoch.
- ``random``: uniform with replacement, never OutOfRange.

TPU adaptation: batches must be shape-static under jit, so a partial final
batch is padded (circular, matching the reference's padding flavor,
padder/circular_padder.h) and returned together with the true count; model
code masks on it.  This runs on host (numpy) — seed generation is trivially
cheap next to device sampling, and keeping it on host preserves the
reference's exact epoch semantics which are data-dependent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from graph_learn_tpu.errors import InvalidArgumentError, OutOfRangeError


class Traverser:
    """Yields (indices[int32 batch], true_count) batches over [0, size)."""

    def __init__(self, size: int, batch_size: int, strategy: str = "by_order",
                 seed: int = 0):
        if size <= 0:
            raise InvalidArgumentError("empty traversal set")
        if batch_size <= 0:
            raise InvalidArgumentError("batch_size must be positive")
        self.size = size
        self.batch_size = batch_size
        self.strategy = strategy
        self.epoch = 0
        self._rng = np.random.default_rng(seed)
        self._cursor = 0
        self._perm: Optional[np.ndarray] = None
        if strategy not in ("by_order", "shuffle", "random"):
            raise InvalidArgumentError("unknown traversal strategy %r" % strategy)
        if strategy == "shuffle":
            self._perm = self._rng.permutation(size).astype(np.int64)

    def next(self) -> Tuple[np.ndarray, int]:
        b = self.batch_size
        if self.strategy == "random":
            idx = self._rng.integers(0, self.size, size=b, dtype=np.int64)
            return idx, b
        if self._cursor >= self.size:
            # epoch exhausted: reset and signal (node_getter.cc:120-131)
            self._cursor = 0
            self.epoch += 1
            if self.strategy == "shuffle":
                self._perm = self._rng.permutation(self.size).astype(np.int64)
            raise OutOfRangeError("No more nodes exist.")
        end = min(self._cursor + b, self.size)
        sel = np.arange(self._cursor, end, dtype=np.int64)
        self._cursor = end
        if self.strategy == "shuffle":
            sel = self._perm[sel]
        count = sel.size
        if count < b:
            # circular pad to the static batch size
            pad = sel[np.arange(b - count) % count]
            sel = np.concatenate([sel, pad])
        return sel, count

    def reset(self):
        self._cursor = 0
