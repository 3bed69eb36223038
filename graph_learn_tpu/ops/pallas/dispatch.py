"""Routing layer: conf.use_pallas gates hot ops onto Pallas kernels.

The product call sites (ops/lookup.py feature gathers; ops/aggregate.py
``embedding_agg`` routes itself) go through these wrappers; with
``conf.use_pallas = False`` (the default) they lower to plain XLA ops,
with ``True`` they run the hand-written kernels.  Hardware coverage:
``GLT_USE_PALLAS=1 GLT_FEATURE_DTYPE=float32 python bench.py`` exercises
the kernels on a real chip (f32 tables — the per-row DMA is only legal
for f32, see feature_gather below); with the bf16 default the gather
falls back to XLA and the flag changes nothing.

Why default-off: measured on a real v5e chip, XLA's vectorised row gather
runs at ~75% of the 4KB-tile-traffic speed of light (each random row
access fetches a full (16, 128) bf16 tile regardless of implementation),
while the per-row-DMA kernel is DMA-issue-bound at ~50 ns/row — XLA wins
on uniform-random access.  The Pallas path exists for (a) capability
parity with the reference's native operator layer and (b) the
locality-bucketed regime: community-structured graphs relabeled by
core/reorder.py put multiple needed rows in one tile, which a kernel can
exploit but XLA's gather cannot.  segment_spmm additionally avoids
materialising the [b, cap, D] gather intermediate that the XLA
formulation writes to HBM when cap is large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_learn_tpu.config import conf


def _interpret() -> bool:
    # compiled Mosaic kernels only exist on TPU; anywhere else (CPU tests,
    # dryrun meshes) the same kernels run in interpret mode
    return jax.default_backend() != "tpu"


def feature_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] for 2D float tables; Pallas row-streaming under the flag.

    idx may have any shape; result shape = idx.shape + (D,).
    """
    # Kernel eligibility: float32 rows with lane-aligned width only.  The
    # per-row DMA path slices (1, D) blocks out of the tiled HBM layout;
    # int32/int64 tables, lane-unaligned widths (D % 128 != 0, e.g.
    # Cora's 1433), and sublane-packed dtypes are rejected by Mosaic.
    # bf16 in particular is (2,1)-packed, so a (1, D) HBM slice fails
    # compile with "Slice shape along dimension 0 must be aligned to
    # tiling (8)" (measured on real v5e via the remote-compile helper);
    # only f32's (1,1) packing admits per-row DMA.  Everything else takes
    # XLA's gather.
    if (not conf.use_pallas or table.ndim != 2
            or table.dtype != jnp.float32
            or table.shape[1] % 128 != 0):
        safe = jnp.clip(idx, 0, table.shape[0] - 1)
        return table[safe]
    from graph_learn_tpu.ops.pallas.gather import _CHUNK, gather_rows
    if idx.size < _CHUNK:  # grid would be all padding — XLA is faster
        safe = jnp.clip(idx, 0, table.shape[0] - 1)
        return table[safe]
    flat = jnp.clip(idx.reshape(-1), 0, table.shape[0] - 1)
    out = gather_rows(table, flat, interpret=_interpret())
    return out.reshape(idx.shape + (table.shape[1],))
