"""PyTorch data bridge: GSL queries as a torch IterableDataset.

Parity with the reference PyTorch data layer
(reference: graphlearn/python/nn/pytorch/data/dataset.py:31-106 — a torch
IterableDataset over a GSL query with an optional ``induce_func`` mapping
the value dict to per-sample graph objects; pyg_dataloader.py:70-130
Collater/PyGDataLoader feeding DDP workers).

TPU redesign: sampling still runs as the jitted device plan (there is no
separate graph-server process to lazily connect to — the store lives in
this process), and finished batches cross to torch via a single
DLPack/numpy hop.  ``induce_func`` mirrors the reference contract: take
the {alias: value} dict, return whatever your torch model consumes (e.g.
PyG ``Data`` objects when torch_geometric is installed).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

try:
    import torch
    from torch.utils.data import IterableDataset as _TorchIterable
except Exception:  # pragma: no cover - torch is in the image, but be safe
    torch = None
    _TorchIterable = object

from graph_learn_tpu.errors import OutOfRangeError
from graph_learn_tpu.gsl.dataset import Dataset as _GLDataset


def _to_torch(x):
    if x is None:
        return None
    a = np.asarray(x)
    try:
        return torch.from_numpy(a)
    except TypeError:  # ml_dtypes (e.g. bfloat16 feature tables)
        return torch.from_numpy(a.astype(np.float32))


def value_to_torch(v):
    """Convert a Nodes/Edges/SparseNodes/SubGraph value to torch tensors.

    Returns a dict of tensors (same field names as the value struct).
    """
    out = {}
    for f in ("ids", "raw_ids", "degrees", "weights", "labels",
              "timestamps", "int_attrs", "float_attrs", "edge_ids"):
        a = getattr(v, f, None)
        if a is not None:
            out[f] = _to_torch(a)
    for sub in ("src_nodes", "dst_nodes", "nodes"):
        n = getattr(v, sub, None)
        if n is not None:
            out[sub] = value_to_torch(n)
    ei = getattr(v, "edge_index", None)
    if ei is not None:
        out["edge_index"] = _to_torch(ei)
    return out


class TorchDataset(_TorchIterable):
    """torch IterableDataset over a GSL query (reference dataset.py:31).

    Yields {alias: {field: torch.Tensor}} dicts, or whatever
    ``induce_func`` returns when given (reference pyG induce contract).
    Iteration ends at epoch boundary (OutOfRangeError), like the
    reference's per-epoch iterator.
    """

    def __init__(self, query, window: int = 10,
                 induce_func: Optional[Callable] = None,
                 epochs: int = 1, tier: Optional[str] = None):
        """``tier="host"`` keeps the graph in host RAM AND pins the
        sampled batches to the host CPU device — torch consumers copy to
        CPU tensors anyway, so the accelerator round-trip is pure waste
        for this bridge (the out-of-core + torch-DDP shape of the
        reference's pytorch dataset, nn/pytorch/data/dataset.py:31)."""
        if torch is None:
            raise ImportError("torch is not available")
        self._query = query
        self._window = window
        self._induce = induce_func
        self._epochs = epochs
        self._tier = tier

    def __iter__(self):
        import jax

        kw = {}
        if self._tier is not None:
            kw["tier"] = self._tier
            if self._tier == "host":
                kw["device"] = jax.devices("cpu")[0]
        for _ in range(self._epochs):
            ds = _GLDataset(self._query, window=self._window, **kw)
            while True:
                try:
                    batch, count = ds.next_with_count()
                except OutOfRangeError:
                    break
                if count < ds.batch_size:
                    # final partial batch: drop circularly-padded rows so
                    # torch consumers never train on phantom samples
                    batch = jax.tree.map(
                        lambda x: x[:count] if hasattr(x, "ndim")
                        and x.ndim >= 1 else x, batch)
                if self._induce is not None:
                    yield self._induce(batch)
                else:
                    yield {a: value_to_torch(v) for a, v in batch.items()}


class Collater:
    """Batch-of-1 collate passthrough (reference pyg_dataloader.py:41-67):
    GSL batches are already batched; DataLoader(batch_size=1) unwraps."""

    def __call__(self, batch):
        assert len(batch) == 1
        return batch[0]


def torch_loader(query, window: int = 10,
                 induce_func: Optional[Callable] = None,
                 tier: Optional[str] = None, **kwargs):
    """torch DataLoader over a GSL query (reference PyGDataLoader)."""
    ds = TorchDataset(query, window=window, induce_func=induce_func,
                      tier=tier)
    kwargs.pop("batch_size", None)
    kwargs.pop("collate_fn", None)
    return torch.utils.data.DataLoader(ds, batch_size=1,
                                       collate_fn=Collater(), **kwargs)
