"""Microbench: sorted segment gather-mean vs plain gather+reshape-mean.

The 62M-edge frontier (PERF.md rule 5) is bound by random feature-row
gathers past the ~16 MB cache tier.  Sorting indices makes the gather ~2x
faster but "breaks output order" — unless the consumer is a
permutation-invariant aggregation, in which case the sort permutation can
be pushed into the segment ids and never undone.  This measures exactly
that trade at the scale-config shapes (2.45M-row table, 153.6k draws,
groups of 10).

Run inside ONE process (the tunnel first-transfer cost is paid once);
import and call run() from an interactive session, or python -m.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # true barrier through tunnel
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def run(n_rows=2_450_000, d=100, b=1024, k1=15, k2=10, dtype="bfloat16",
        iters=8):
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    table = jax.device_put(
        rng.standard_normal((n_rows, d), np.float32).astype(dt))
    n = b * k1 * k2
    nseg = b * k1
    idx = jax.device_put(rng.integers(0, n_rows, n).astype(np.int32))
    keys = jax.random.split(jax.random.key(0), iters)

    # NOTE: the table must be a jit ARGUMENT — a closure capture embeds it
    # as a program constant, and the tunnel's remote-compile endpoint
    # rejects multi-hundred-MB program uploads (HTTP 413).
    @jax.jit
    def plain(table, idx):
        rows = table[idx]
        return rows.reshape(nseg, k2, d).astype(jnp.float32).mean(1)

    @jax.jit
    def sorted_seg(table, idx):
        order = jnp.argsort(idx)
        rows = table[idx[order]].astype(jnp.float32)
        seg = (order // k2).astype(jnp.int32)
        return jax.ops.segment_sum(rows, seg, num_segments=nseg) / k2

    @jax.jit
    def sort_only(table, idx):
        return jnp.argsort(idx)

    @jax.jit
    def gather_only(table, idx):
        return table[idx]

    idx_sorted = jnp.sort(idx)
    res = {}
    res["plain_ms"] = timed(plain, table, idx, iters=iters) * 1e3
    res["sorted_seg_ms"] = timed(sorted_seg, table, idx, iters=iters) * 1e3
    res["sort_only_ms"] = timed(sort_only, table, idx, iters=iters) * 1e3
    res["gather_only_ms"] = timed(gather_only, table, idx, iters=iters) * 1e3
    res["gather_presorted_ms"] = timed(
        gather_only, table, idx_sorted, iters=iters) * 1e3
    # numeric check
    a = plain(table, idx)
    c = sorted_seg(table, idx)
    res["max_abs_diff"] = float(jnp.max(jnp.abs(a - c)))
    for k, v in res.items():
        print("  %-22s %s" % (k, ("%.3f" % v) if isinstance(v, float) else v))
    return res


if __name__ == "__main__":
    print("bf16 D=100:")
    run()
    print("f32 D=100:")
    run(dtype="float32")
