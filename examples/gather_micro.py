"""Microbench: sorted segment gather-mean vs plain gather+reshape-mean.

The 62M-edge frontier (PERF.md rule 5) is bound by random feature-row
gathers past the ~16 MB cache tier.  Sorting indices makes the gather
faster (sorted accesses walk HBM pages sequentially) but "breaks output
order" — unless the consumer is a permutation-invariant aggregation, in
which case the sort permutation can be pushed into the segment ids and
never undone.  This measures exactly that trade at the scale-config
shapes (2.45M-row table, 153.6k draws, groups of 10).

Methodology (the tunnel lies twice): each variant runs K=24 iterations
inside ONE lax.scan under ONE jit with per-step index variation (so XLA
cannot hoist the gather), returning a scalar checksum whose float() pull
is the only true barrier; dispatch/RTT noise is amortised over K.
The table must be a jit ARGUMENT — closure capture embeds it as a
program constant and the remote-compile endpoint rejects the upload
(HTTP 413).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 24


def timed_scan(fn, table, idx0, iters=3):
    """fn(table, idx0) -> scalar, runs K steps inside. Returns s/step."""
    _ = float(fn(table, idx0))  # compile + first exec
    t0 = time.perf_counter()
    acc = 0.0
    for _i in range(iters):
        acc += float(fn(table, idx0))
    dt = (time.perf_counter() - t0) / (iters * K)
    return dt, acc


def make_variants(n_rows, nseg, k2, d):
    prime = 7919

    def vary(idx0, i):
        return (idx0 + i * prime) % n_rows

    @jax.jit
    def plain(table, idx0):
        def step(c, i):
            rows = table[vary(idx0, i)]
            out = rows.reshape(nseg, k2, d).astype(jnp.float32).mean(1)
            return c + out[0, 0], None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    @jax.jit
    def sorted_seg(table, idx0):
        def step(c, i):
            idx = vary(idx0, i)
            order = jnp.argsort(idx)
            rows = table[idx[order]].astype(jnp.float32)
            seg = (order // k2).astype(jnp.int32)
            out = jax.ops.segment_sum(rows, seg, num_segments=nseg) / k2
            return c + out[0, 0], None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    @jax.jit
    def sort_only(table, idx0):
        def step(c, i):
            return c + jnp.argsort(vary(idx0, i))[0].astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    @jax.jit
    def gather_only(table, idx0):
        def step(c, i):
            return c + table[vary(idx0, i)][0, 0].astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    @jax.jit
    def gather_presorted(table, idx0):
        # idx0 sorted with headroom: +i keeps it sorted, same distribution
        def step(c, i):
            return c + table[idx0 + i][0, 0].astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    @jax.jit
    def segsum_only(table, idx0):
        # scatter-add cost alone: rows from a FIXED slab (cache-resident)
        def step(c, i):
            idx = vary(idx0, i)
            order = jnp.argsort(idx)
            rows = table[idx[order] % 1024].astype(jnp.float32)
            seg = (order // k2).astype(jnp.int32)
            out = jax.ops.segment_sum(rows, seg, num_segments=nseg)
            return c + out[0, 0], None
        return jax.lax.scan(step, jnp.float32(0), jnp.arange(K))[0]

    return dict(plain=plain, sorted_seg=sorted_seg, sort_only=sort_only,
                gather_only=gather_only, gather_presorted=gather_presorted,
                segsum_only=segsum_only)


def run(n_rows=2_450_000, d=100, b=1024, k1=15, k2=10, dtype="bfloat16",
        iters=3):
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    table = jax.device_put(
        rng.standard_normal((n_rows, d), np.float32).astype(dt))
    n = b * k1 * k2
    nseg = b * k1
    idx_np = rng.integers(0, n_rows - K - 1, n).astype(np.int32)
    idx = jax.device_put(idx_np)
    idx_sorted = jax.device_put(np.sort(idx_np))
    fns = make_variants(n_rows, nseg, k2, d)

    res = {}
    for name, fn in fns.items():
        arg = idx_sorted if name == "gather_presorted" else idx
        res[name + "_ms"], _ = timed_scan(fn, table, arg, iters=iters)
        res[name + "_ms"] *= 1e3
    # numeric check vs unfused
    rows = np.asarray(table[idx]).astype(np.float32)
    want = rows.reshape(nseg, k2, d).mean(1)

    from graph_learn_tpu.config import conf
    from graph_learn_tpu.ops.aggregate import gather_group_agg
    old = (conf.sorted_gather, conf.sorted_gather_min_bytes)
    conf.sorted_gather, conf.sorted_gather_min_bytes = True, 0
    got = np.asarray(gather_group_agg(table, idx.reshape(nseg, k2),
                                      op="mean"))
    conf.sorted_gather, conf.sorted_gather_min_bytes = old
    res["max_abs_diff"] = float(np.abs(got - want).max())
    for k, v in res.items():
        print("  %-22s %.3f" % (k, v))
    return res


if __name__ == "__main__":
    print("bf16 D=100:")
    run()
    print("f32 D=100:")
    run(dtype="float32")
