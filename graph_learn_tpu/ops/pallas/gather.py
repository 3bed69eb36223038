"""Pallas feature-gather kernel: rows of an HBM table by dynamic indices.

The hottest memory op in the framework: every GSL hop lookup is
``table[idx]`` with table [N, D] resident in HBM and idx [M] sampled ids.
This kernel streams the requested rows with per-row async DMAs
(HBM -> VMEM, deep-pipelined) — the table never materialises in VMEM and
the [M, D] result XLA's gather would stage is produced directly.

Replaces the reference's attribute-lookup RPC path
(reference: node_lookuper.cc:24 LookupNodes served from C++ maps) with an
on-chip bandwidth-bound kernel.

TPU layout notes (learned the hard way): 1D/2D int32 HBM arrays carry
full-length / sublane tiling that rejects partial DMA slices, so indices
travel as [G, 8, 512] — leading dims are untiled and ``idx.at[g]`` DMAs a
clean (8, 512) block into SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 512  # int32 lane tile
_SUB = 8  # sublane rows per index block
_CHUNK = _SUB * _LANE  # indices (and output rows) per grid step
_NBUF = 16  # DMA pipeline depth


def _gather_kernel(idx_hbm, table_hbm, out_ref, idx_smem, bufs, sems,
                   idx_sem):
    g = pl.program_id(0)
    cp = pltpu.make_async_copy(idx_hbm.at[g], idx_smem, idx_sem)
    cp.start()
    cp.wait()

    def get_dma(slot, r):
        # DMA straight into the output row — no staging buffer
        idx = idx_smem[r // _LANE, r % _LANE]
        return pltpu.make_async_copy(
            table_hbm.at[idx], out_ref.at[r], sems.at[slot])

    for r in range(_NBUF):
        get_dma(r, r).start()

    def body(r, _):
        slot = r % _NBUF
        get_dma(slot, r).wait()

        @pl.when(r + _NBUF < _CHUNK)
        def _():
            get_dma(slot, r + _NBUF).start()

        return 0

    jax.lax.fori_loop(0, _CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jax.Array, idx: jax.Array,
                interpret: bool = False) -> jax.Array:
    """table [N, D], idx [M] int32 -> [M, D]."""
    m = idx.shape[0]
    n, d = table.shape
    m_pad = -(-m // _CHUNK) * _CHUNK
    idx_p = idx.astype(jnp.int32)
    if m_pad != m:
        idx_p = jnp.concatenate(
            [idx_p, jnp.zeros((m_pad - m,), jnp.int32)])
    grid = m_pad // _CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idx [G, 8, 512] in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((_CHUNK, d), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.SMEM((_SUB, _LANE), jnp.int32),
            pltpu.VMEM((_NBUF, d), table.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), table.dtype),
        interpret=interpret,
    )(idx_p.reshape(grid, _SUB, _LANE), table)
    return out[:m]


def gather(table: jax.Array, idx: jax.Array, use_pallas: bool = True,
           interpret: bool = False) -> jax.Array:
    """Nested-shape gather with XLA fallback (CPU / tiny shapes)."""
    shape = idx.shape
    if not use_pallas or table.ndim != 2 or idx.size < _CHUNK:
        return table[idx]
    flat = idx.reshape(-1)
    out = gather_rows(table, flat, interpret=interpret)
    return out.reshape(shape + (table.shape[1],))
