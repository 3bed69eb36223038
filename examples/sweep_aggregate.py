"""Sweep-aggregate prototype: MEASURE the 62M-edge floor claim (VERDICT r3).

PERF.md's frontier table shows the full-table sequential stream reads all
1.25 GB in 1.17 ms while gathering 6% of it costs 2.82 ms — and rejected
the sweep-aggregate rewrite on an ESTIMATE of the Mosaic VMEM
scatter-accumulate cost.  This prototype builds the real kernel and
measures every stage so the floor argument is numbers, not estimates:

  bar        XLA gather + reshape-mean (the op being replaced)
  sort       argsort of the flat indices (prep stage 1)
  hitlist    per-slab hit tables via searchsorted + scatter (prep stage 2)
  stream     Pallas kernel that only streams the table (roofline)
  sweep      Pallas kernel: stream slabs + VMEM scatter-accumulate into
             the [G, D] output via a per-hit loop (THE measured question:
             what does a dynamic-row read-modify-write cost in Mosaic?)

The sweep kernel:
  grid over slabs of R table rows; the table streams through VMEM via the
  BlockSpec pipeline (double-buffered).  A prep pass in XLA sorts the
  flat gather indices, buckets them by slab, and emits per-slab padded
  hit tables (local row in slab, output group id).  The kernel loops over
  the slab's hits accumulating rows into the resident [G, D] f32 output.
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


def make_sweep_kernel(n_rows, n_groups, R, cap, D=128,
                      hits_in_smem=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_slabs = -(-n_rows // R)

    def kernel(counts_ref, hits_ref, gids_ref, slab_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        cnt = counts_ref[s]

        def body(i, _):
            r = hits_ref[0, i]
            g = gids_ref[0, i]
            out_ref[g, :] += slab_ref[r, :]
            return 0

        jax.lax.fori_loop(0, cnt, body, 0, unroll=False)

    hit_space = pltpu.SMEM if hits_in_smem else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec((1, cap), lambda s, c: (s, 0),
                         memory_space=hit_space),
            pl.BlockSpec((1, cap), lambda s, c: (s, 0),
                         memory_space=hit_space),
            pl.BlockSpec((R, D), lambda s, c: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_groups, D), lambda s, c: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def sweep(counts, hits, gids, table):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_groups, D), jnp.float32),
        )(counts, hits, gids, table)

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


def make_prep(n_rows, R, cap, n_slabs):
    """XLA prep: sorted hit tables per slab.

    flat [N] row ids -> (counts [n_slabs], hits [n_slabs, cap] local rows,
    gids [n_slabs, cap] output group ids).  Cost of this stage is part of
    the sweep path's total and is timed separately.
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
        # position of each hit within its slab's bucket
        starts = jnp.searchsorted(slab_of, jnp.arange(n_slabs))
        pos = jnp.arange(n) - starts[slab_of]
        counts = jnp.bincount(slab_of, length=n_slabs).astype(jnp.int32)
        overflow = jnp.sum((pos >= cap).astype(jnp.int32))
        posc = jnp.minimum(pos, cap - 1)
        hits = jnp.zeros((n_slabs, cap), jnp.int32).at[
            slab_of, posc].set((rows_sorted - slab_of * R).astype(jnp.int32))
        gids = jnp.zeros((n_slabs, cap), jnp.int32).at[
            slab_of, posc].set(groups_sorted)
        return jnp.minimum(counts, cap), hits, gids, overflow

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
    mean_hits = N / n_slabs
    cap = int(min(max(4 * mean_hits, 64), N))
    print("[sweep] rows=%d N=%d k=%d slabs=%d cap=%d out=%.1fMB "
          "slab=%.1fMB" % (n_rows, N, k, n_slabs, cap, G * D * 4 / 1e6,
                           R * D * 4 / 1e6), flush=True)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n_rows, D), np.float32))
    prep = make_prep(n_rows, R, cap, n_slabs)

    def ref(flat):
        rows = table[flat]
        return jnp.mean(rows.reshape(G, k, D), axis=1)

    ref_j = jax.jit(ref)

    if args.interpret_check or jax.default_backend() == "cpu":
        # correctness in interpret mode at the small shape
        from jax.experimental import pallas as pl  # noqa: F401
        flat = jnp.asarray(rng.integers(0, n_rows, N, dtype=np.int32))
        counts, hits, gids, ov = prep(flat, k)
        assert int(ov) == 0, "hit-table overflow at cap=%d" % cap
        import jax.experimental.pallas as _pl
        sweep = make_sweep_kernel(n_rows, G, R, cap, D)
        # interpret mode: monkey-wrap via pltpu interpret flag
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out_sum = sweep(counts, hits, gids, table)
        got = out_sum / k
        want = ref_j(flat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        print("[sweep] interpret-mode correctness OK", flush=True)
        return

    # --- timed on hardware (true value-pull barriers, PERF.md rule 6) ---
    sweep = make_sweep_kernel(n_rows, G, R, cap, D)
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
    t_bar = timeit(ref_j, "bar: gather+reshape-mean", *[(f,) for f in keys])
    # prep stages
    t_prep = timeit(prep, "prep: sort+hitlists",
                    *[(f, k) for f in keys])
    preps = [tuple(prep(f, k)[:3]) for f in keys]
    # roofline
    timeit(stream, "stream: full-table sum", (table,))
    # the kernel
    t_kern = timeit(sweep, "sweep: scatter-accumulate",
                    *[(c, h, g2, table) for (c, h, g2) in preps])
    print("[sweep] total sweep path = %.3f ms (prep %.3f + kernel %.3f) "
          "vs bar %.3f ms" % (t_prep + t_kern, t_prep, t_kern, t_bar),
          flush=True)
    # correctness on hardware
    counts, hits, gids, ov = prep(keys[0], k)
    assert int(ov) == 0
    got = sweep(counts, hits, gids, table) / k
    want = ref_j(keys[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    print("[sweep] hardware correctness OK", flush=True)


if __name__ == "__main__":
    main()
