"""Serving-model export: serialize the fused sample+forward plan.

TPU-native equivalent of the reference TF-serving export
(reference: graphlearn/examples/tf/serving/export_serving_model.py — the
trained EgoGraph model is exported as a TF SavedModel so an external
TF-serving fleet can answer embed/predict requests).  Here the WHOLE
serving program — GSL sampling plan + feature encoding + model forward —
is one jitted function, exported as a portable StableHLO artifact via
``jax.export``.  A serving process deserializes it and calls it with raw
seed ids; no Python model code or graph store is needed at load time
(tables are baked in as constants unless passed as inputs).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as _jx


def export_serving_fn(fn: Callable, example_args, path: Optional[str] = None,
                      platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jax.jit(fn)`` traced at ``example_args`` shapes.

    ``fn`` is typically ``lambda tables, seeds, key: model.apply(params,
    EgoGraph.from_query_result(_execute(query, tables, seeds, key), ...))``
    with params closed over.  Returns the serialized bytes; also writes
    them to ``path`` when given.
    """
    args = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype") else x, example_args)
    exp = _jx.export(jax.jit(fn), platforms=platforms)(*args)
    blob = exp.serialize()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_serving_fn(path_or_bytes) -> Callable:
    """Deserialize an exported serving function; returns ``call(*args)``."""
    return load_serving_exported(path_or_bytes).call


def load_serving_exported(path_or_bytes) -> "_jx.Exported":
    """Deserialize to the full Exported (call + in_avals for shape
    introspection — the serving tier reads the traced batch size)."""
    blob = path_or_bytes
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return _jx.deserialize(blob)
