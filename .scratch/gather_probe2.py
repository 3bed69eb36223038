"""Scan-fused gather probes (no dispatch overhead), matching PERF method."""
import time
import jax, jax.numpy as jnp

N = 2_450_000
D = 128
M = 153_600 + 15_360 + 1024   # all hop rows of one step
R = 10

feats_bf = jax.random.normal(jax.random.key(0), (N, D), jnp.float32).astype(jnp.bfloat16)
jax.block_until_ready(feats_bf)


def scan_time(name, fn, *args, reps=3):
    @jax.jit
    def run(key, *a):
        def body(c, k):
            idx = jax.random.randint(k, (M,), 0, N, jnp.int32)
            out = fn(idx, *a)
            return c + jnp.sum(out[0].astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jax.random.split(key, R))
        return c
    _ = float(run(jax.random.key(9), *args))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(reps):
        acc += float(run(jax.random.key(i), *args))
    dt = (time.perf_counter() - t0) / (reps * R) * 1e3
    print(f"{name:44s} {dt:8.3f} ms/step", flush=True)
    return dt


scan_time("idx gen only", lambda idx: idx[None, :4].astype(jnp.float32))
scan_time("gather bf16 [170k rows]", lambda idx, t: t[idx], feats_bf)
small = feats_bf[:65536]
jax.block_until_ready(small)
scan_time("gather bf16 from 16MB table", lambda idx, t: t[idx & 65535], small)
