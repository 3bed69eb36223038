"""Sweep-aggregate prototype: MEASURE the 62M-edge floor claim (VERDICT r3).

PERF.md's frontier table shows the full-table sequential stream reads all
1.25 GB in 1.17 ms while gathering 6% of it costs 2.82 ms — and rejected
the sweep-aggregate rewrite on an ESTIMATE of the Mosaic VMEM
scatter-accumulate cost.  This prototype builds the real kernel and
measures every stage so the floor argument is numbers, not estimates:

  bar        XLA gather + reshape-mean (the op being replaced)
  prep       argsort of the flat indices + packed flat hit list
             (local_row | group << 12) + per-slab start offsets
  stream     Pallas kernel that only streams the table (roofline)
  sweep      Pallas kernel: stream slabs + VMEM scatter-accumulate into
             the [G, D] output via a per-hit loop (THE measured question:
             what does a dynamic-row read-modify-write cost in Mosaic?)

The sweep kernel:
  grid over slabs of R table rows; the table streams through VMEM via the
  BlockSpec pipeline (double-buffered).  A prep pass in XLA sorts the
  flat gather indices and packs (local row in slab, output group id)
  into one int32 per hit; the flat hit list + slab starts ride as
  scalar-prefetch operands (unblocked SMEM).  The kernel loops over the
  slab's hit run accumulating rows into the resident [G, D] f32 output.
  Output stays in VMEM across grid steps (constant block index);
  correctness is asserted against the XLA reference.

Usage:  python examples/sweep_aggregate.py [--small] [--steps N]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sweep_kernel(n_rows, n_groups, R, D=128):
    """Hit list rides as flat SCALAR-PREFETCH arrays (unblocked SMEM):
    ``packed[j] = local_row | group << 12`` sorted by slab, with per-slab
    ``starts`` offsets.  Mosaic's 8x128 block tiling forbids (1, cap)
    VMEM/SMEM hit-table blocks; scalar-prefetch operands are exempt, and
    the kernel reads them scalar-at-a-time anyway (loop bounds + dynamic
    row ids for the VMEM read-modify-write)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_slabs = -(-n_rows // R)
    # the hit word unpacks local_row as `v & (R - 1)` — valid only for
    # power-of-two slab sizes, and the group id rides in bits >= 12
    assert R <= (1 << 12) and R & (R - 1) == 0, \
        "--slab must be a power of two <= 4096"

    def kernel(starts_ref, packed_ref, slab_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            v = packed_ref[j]
            r = v & (R - 1)
            g = v >> 12
            out_ref[g, :] += slab_ref[r, :]
            return 0

        jax.lax.fori_loop(starts_ref[s], starts_ref[s + 1], body, 0,
                          unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts, packed
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec((R, D), lambda s, st, pk: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_groups, D), lambda s, st, pk: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def sweep(starts, packed, table):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, D), jnp.float32),
        )(starts, packed, table)

    return sweep


def make_stream_kernel(n_rows, R, D=128):
    """Roofline: stream the whole table, one running (1, D) sum."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_slabs = -(-n_rows // R)

    def kernel(slab_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.sum(slab_ref[:], axis=0, keepdims=True)

    @jax.jit
    def stream(table):
        return pl.pallas_call(
            kernel,
            grid=(n_slabs,),
            in_specs=[pl.BlockSpec((R, D), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, D), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        )(table)

    return stream


def make_prep(n_rows, R, n_slabs):
    """XLA prep: flat sorted packed hit list + per-slab start offsets.

    flat [N] row ids -> (starts [n_slabs+1] int32,
    packed [N] int32 = local_row | group << 12, sorted by row so slab
    runs are contiguous).  Cost of this stage is part of the sweep
    path's total and is timed separately.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prep(flat, k):
        n = flat.shape[0]
        order = jnp.argsort(flat)
        rows_sorted = flat[order]
        groups_sorted = (order // k).astype(jnp.int32)
        slab_of = rows_sorted // R
        starts = jnp.searchsorted(
            slab_of, jnp.arange(n_slabs + 1)).astype(jnp.int32)
        packed = ((rows_sorted - slab_of * R).astype(jnp.int32)
                  | (groups_sorted << 12))
        return starts, packed

    return prep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--slab", type=int, default=4096)
    ap.add_argument("--interpret_check", action="store_true",
                    help="CPU interpret-mode correctness check only")
    args = ap.parse_args()

    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.small:
        n_rows, N, k = 20_000, 8_192 * 2, 8
    else:
        # the 62M-edge frontier shape: 2.45M rows x 100 feats (padded to
        # 128 lanes), 153.6k draws (b=1024, fanout [15,10] deepest hop)
        n_rows, N, k = 2_457_600, 153_600, 10
    D = 128
    R = args.slab
    n_slabs = -(-n_rows // R)
    G = N // k
    assert G < (1 << 18) and R <= (1 << 12) and R & (R - 1) == 0, \
        "--slab must be a power of two <= 4096"
    print("[sweep] rows=%d N=%d k=%d slabs=%d out=%.1fMB slab=%.1fMB "
          "hitlist=%.1fKB(smem)" % (n_rows, N, k, n_slabs,
                                    G * D * 4 / 1e6, R * D * 4 / 1e6,
                                    N * 4 / 1e3), flush=True)

    rng = np.random.default_rng(0)
    # generate the table ON DEVICE: uploading 1.25 GB through the tunnel
    # costs minutes (PERF.md warmup section) and is not what we measure
    table = jax.jit(
        lambda k: jax.random.normal(k, (n_rows, D), jnp.float32)
    )(jax.random.key(0))
    jax.block_until_ready(table)
    print("[sweep] table resident %.2f GB" % (n_rows * D * 4 / 1e9),
          flush=True)
    prep = make_prep(n_rows, R, n_slabs)

    def ref(tbl, flat):
        # table is an ARGUMENT, not a closure constant: jit lowers large
        # closure constants by materialising them on host (PERF.md)
        rows = tbl[flat]
        return jnp.mean(rows.reshape(G, k, D), axis=1)

    ref_j = jax.jit(ref)

    if args.interpret_check or jax.default_backend() == "cpu":
        # correctness in interpret mode at the small shape
        flat = jnp.asarray(rng.integers(0, n_rows, N, dtype=np.int32))
        starts, packed = prep(flat, k)
        sweep = make_sweep_kernel(n_rows, G, R, D)
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out_sum = sweep(starts, packed, table)
        got = out_sum / k
        want = ref_j(table, flat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        print("[sweep] interpret-mode correctness OK", flush=True)
        return

    # --- timed on hardware (true value-pull barriers, PERF.md rule 6) ---
    sweep = make_sweep_kernel(n_rows, G, R, D)
    stream = make_stream_kernel(n_rows, R, D)
    steps = args.steps
    keys = [jnp.asarray(rng.integers(0, n_rows, N, dtype=np.int32))
            for _ in range(4)]

    def timeit(fn, label, *argsets):
        outs = fn(*argsets[0])
        _ = float(jnp.sum(jax.tree.leaves(outs)[0]))  # warm + barrier
        t0 = time.perf_counter()
        for i in range(steps):
            outs = fn(*argsets[i % len(argsets)])
        _ = float(jnp.sum(jax.tree.leaves(outs)[0]))
        dt = (time.perf_counter() - t0) / steps * 1e3
        print("%-28s %.3f ms" % (label, dt), flush=True)
        return dt

    # the bar
    t_bar = timeit(ref_j, "bar: gather+reshape-mean",
                   *[(table, f) for f in keys])
    # prep stages
    t_prep = timeit(prep, "prep: sort+packed hitlist",
                    *[(f, k) for f in keys])
    preps = [tuple(prep(f, k)) for f in keys]
    # roofline
    timeit(stream, "stream: full-table sum", (table,))
    # the kernel
    t_kern = timeit(sweep, "sweep: scatter-accumulate",
                    *[(s, pk, table) for (s, pk) in preps])
    print("[sweep] total sweep path = %.3f ms (prep %.3f + kernel %.3f) "
          "vs bar %.3f ms" % (t_prep + t_kern, t_prep, t_kern, t_bar),
          flush=True)
    # correctness on hardware
    starts, packed = prep(keys[0], k)
    got = sweep(starts, packed, table) / k
    want = ref_j(table, keys[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    print("[sweep] hardware correctness OK", flush=True)


if __name__ == "__main__":
    main()
