"""Probe the big-graph feature-gather frontier on the real chip.

Candidates for out[i] = mean_{c<k2} feats[ids[i*k2+c]] at 62M-edge scale:
  A. unsorted gather + reshape-mean (current product path)
  B. sort ids -> gather sorted (locality) -> unsort via staged gather
  C. sort ids -> gather sorted -> fold unsort into segment_sum consumer
  D. gather only (no consumer) sorted vs unsorted, to isolate
"""
import time, sys, functools
import jax, jax.numpy as jnp
import numpy as np

N = 2_450_000
D = 128
B = 1024
K1, K2 = 15, 10
M = B * K1 * K2   # 153600 hop2 rows
SEG = B * K1

dt = jnp.bfloat16
key = jax.random.key(0)
feats = jax.random.normal(key, (N, D), jnp.float32).astype(dt)
idx = jax.random.randint(jax.random.key(1), (M,), 0, N, jnp.int32)
jax.block_until_ready((feats, idx))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # true barrier via value pull
    _ = float(jnp.sum(out[0]).astype(jnp.float32)) if hasattr(out, 'shape') else None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out if out.ndim == 0 else out[0]).astype(jnp.float32))
    dtm = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dtm:8.3f} ms", flush=True)
    return dtm


@jax.jit
def a_gather_mean(feats, idx):
    g = feats[idx]                           # [M, D]
    return jnp.mean(g.reshape(SEG, K2, D).astype(jnp.float32), axis=1)

@jax.jit
def d_gather_only(feats, idx):
    return feats[idx]

@jax.jit
def d_gather_sorted_only(feats, idx):
    s = jnp.sort(idx)
    return feats[s]

@jax.jit
def b_sort_gather_unsort(feats, idx):
    order = jnp.argsort(idx)
    g = feats[idx[order]]                    # sorted-locality gather
    inv = jnp.argsort(order)
    g2 = g[inv]                              # staged unsort gather
    return jnp.mean(g2.reshape(SEG, K2, D).astype(jnp.float32), axis=1)

@jax.jit
def c_sort_gather_segsum(feats, idx):
    order = jnp.argsort(idx)
    g = feats[idx[order]].astype(jnp.float32)
    seg = order // K2                        # original segment of each sorted row
    s = jax.ops.segment_sum(g, seg, num_segments=SEG)
    return s / K2

@jax.jit
def sort_only(idx):
    return jnp.argsort(idx)

timeit("sort_only(argsort 154k)", sort_only, idx)
timeit("D gather only (unsorted)", d_gather_only, feats, idx)
timeit("D gather only (sorted ids)", d_gather_sorted_only, feats, idx)
timeit("A unsorted gather + reshape mean", a_gather_mean, feats, idx)
timeit("B sort/gather/staged-unsort + mean", b_sort_gather_unsort, feats, idx)
timeit("C sort/gather + segment_sum", c_sort_gather_segsum, feats, idx)
