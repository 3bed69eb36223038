"""Validate Pallas kernels compiled on the REAL chip (not interpret)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.default_backend(), flush=True)
from graph_learn_tpu.ops.pallas.gather import gather_rows, _CHUNK
from graph_learn_tpu.ops.pallas.spmm import segment_spmm, segment_spmm_xla

rng = np.random.default_rng(0)

# --- gather_rows ---
n, d = 100_000, 128
table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, n, 2 * _CHUNK).astype(np.int32))
out = gather_rows(table, idx)
ref = table[idx]
np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
print("gather_rows OK (compiled)", flush=True)

def timeit(name, fn, *a, reps=10):
    o = fn(*a); jax.block_until_ready(o)
    _ = float(jnp.sum(o[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*a)
    _ = float(jnp.sum(o[0]))
    print("%-28s %.3f ms" % (name, (time.perf_counter() - t0) / reps * 1e3),
          flush=True)

big_idx = jnp.asarray(rng.integers(0, n, 40 * _CHUNK).astype(np.int32))
timeit("pallas gather 164k rows", lambda: gather_rows(table, big_idx))
timeit("xla    gather 164k rows", jax.jit(lambda t, i: t[i]), table, big_idx)

# --- segment_spmm ---
feats = jnp.asarray(rng.standard_normal((50_000, 128)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, 50_000, (1024, 32)).astype(np.int32))
degs = jnp.asarray(rng.integers(0, 33, 1024).astype(np.int32))
for agg in ("sum", "mean", "max"):
    o = segment_spmm(feats, ids, degs, agg=agg)
    r = segment_spmm_xla(feats, ids, degs, agg=agg)
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=2e-5,
                               atol=2e-5)
print("segment_spmm OK (compiled)", flush=True)
timeit("pallas spmm 1024x32", lambda: segment_spmm(feats, ids, degs, agg="mean"))
timeit("xla    spmm 1024x32",
       jax.jit(lambda f, i, dg: segment_spmm_xla(f, i, dg, agg="mean")),
       feats, ids, degs)
print("ALL OK", flush=True)
