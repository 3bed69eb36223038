"""Pallas kernels in interpret mode (CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_learn_tpu.ops.pallas.gather import gather_rows
from graph_learn_tpu.ops.pallas.spmm import segment_spmm, segment_spmm_xla


def test_gather_rows_interpret():
    table = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.array([3, 0, 63, 7, 7, 12, 1, 2], jnp.int32)
    out = gather_rows(table, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]))


@pytest.mark.parametrize("agg", ["sum", "mean", "max"])
def test_segment_spmm_interpret(agg):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((50, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 50, (6, 5)).astype(np.int32))
    degs = jnp.asarray(np.array([5, 3, 0, 1, 4, 2], np.int32))
    out = segment_spmm(feats, ids, degs, agg=agg, interpret=True)
    ref = segment_spmm_xla(feats, ids, degs, agg=agg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
