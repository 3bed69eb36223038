"""Pallas feature-gather kernel: rows of an HBM table by dynamic indices.

The hottest memory op in the framework: every GSL hop lookup is
``table[idx]`` with table [N, D] resident in HBM and idx [M] sampled ids.
XLA lowers this to a generic gather; this kernel instead streams rows with
scalar-prefetched indices — the BlockSpec index_map reads the index array
(available before the kernel body, PrefetchScalarGridSpec) so each grid
step DMAs exactly the requested row block HBM->VMEM.

Replaces the reference's attribute-lookup RPC path
(reference: node_lookuper.cc:24 LookupNodes served from C++ maps) with an
on-chip bandwidth-bound kernel.

Row blocking: indices are processed in groups of ``block_rows``; rows
within a group are gathered by one kernel invocation into VMEM and written
out contiguously.  D should be a multiple of 128 for full lanes (padded
otherwise by XLA's layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref):
    # grid step i handles one output row; the index_map already selected
    # the right table row block, so this is a straight copy.
    out_ref[...] = table_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jax.Array, idx: jax.Array,
                interpret: bool = False) -> jax.Array:
    """table [N, D], idx [M] int32 -> [M, D].

    One grid step per output row; the index map prefetches idx and points
    the input block at row idx[i].  Equivalent to ``table[idx]``.
    """
    m = idx.shape[0]
    n, d = table.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, idx_ref: (idx_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, d), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), table)


def gather(table: jax.Array, idx: jax.Array, use_pallas: bool = True,
           interpret: bool = False) -> jax.Array:
    """Nested-shape gather with XLA fallback (CPU / tiny shapes)."""
    shape = idx.shape
    if not use_pallas or table.ndim != 2 or idx.size < 256:
        return table[idx]
    flat = idx.reshape(-1)
    out = gather_rows(table, flat, interpret=interpret)
    return out.reshape(shape + (table.shape[1],))
