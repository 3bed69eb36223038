"""Scan-fused gather probes (no dispatch overhead), matching PERF method."""
import time
import jax, jax.numpy as jnp

N = 2_450_000
D = 128
M = 153_600 + 15_360 + 1024   # all hop rows of one step
R = 10

feats_bf = jax.random.normal(jax.random.key(0), (N, D), jnp.float32).astype(jnp.bfloat16)
feats_f32 = feats_bf.astype(jnp.float32)
jax.block_until_ready((feats_bf, feats_f32))


def scan_time(name, fn, *args, reps=5):
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


@jax.jit
def noop(idx):
    return idx.astype(jnp.float32)[None, :]

scan_time("idx gen only", lambda idx: idx[None, :4].astype(jnp.float32))
scan_time("gather bf16 [170k rows]", lambda idx, t: t[idx], feats_bf)
scan_time("gather f32  [170k rows]", lambda idx, t: t[idx], feats_f32)
scan_time("gather bf16 sorted", lambda idx, t: t[jnp.sort(idx)], feats_bf)
scan_time("gather bf16 2 halves",
          lambda idx, t: jnp.concatenate([t[idx[:M//2]], t[idx[M//2:]]]), feats_bf)
# take with one-hot matmul on a 64-wide window after integer division:
# probe VMEM-cached small-table gather rate for comparison
small = feats_bf[:65536]
scan_time("gather bf16 from 16MB table", lambda idx, t: t[idx & 65535], small)
small2 = feats_bf[:32768]
scan_time("gather bf16 from 8MB table", lambda idx, t: t[idx & 32767], small2)
