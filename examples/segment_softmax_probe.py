"""Segment-softmax fusion probe: can fusing the GAT neighbor block beat XLA?

PERF.md's r4 attention section leaves ONE unmeasured lever: a
flash-attention-style fusion that computes the per-seed neighbor
attention (project -> score -> softmax over k2 -> weighted sum) without
ever writing the wide [N, heads*width] projections to HBM.  This probe
measures the FORWARD of that block at the 62M-edge frontier shape so the
round-5 decision is numbers:

  bar      unfused XLA forward at full N (what EgoGAT compiles to today:
           Wx materializes in HBM between the matmul and the softmax)
  chunked  lax.map over seed chunks — tests whether XLA alone keeps the
           per-chunk intermediates on-chip when they are VMEM-sized
  pallas   fused kernel, grid (seed blocks x heads): the gathered raw
           rows stream in per block, Wx lives only in VMEM, only the
           [S, width] attention output is written per (block, head)

All variants consume the SAME pre-gathered [N, D] row buffer — the
gather itself is the separately-measured 2.5 ms floor (PERF.md) and is
out of scope here.  Semantics mirror ego_gat_conv.py: score_ij =
leaky_relu(a_l . Wh_i + a_r . Wh_j), softmax over the k2 neighbors,
output = sum_j alpha_ij Wh_j  (reference nn/tf/layers/ego_gat_conv.py,
gat_conv.py:99-111 segment softmax).

Usage: python examples/segment_softmax_probe.py [--small] [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pallas(S, k2, D, H, W, n_blocks):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, al_ref, ar_ref, out_ref):
        # x_ref: [S*k2, D] this seed block's gathered neighbor rows;
        # w_ref: [1, D, W] this head's projection; al/ar: [1, 1, W].
        # Wx lives ONLY here in VMEM; the "self" score term uses each
        # seed group's first row as its own projection (probe layout).
        wx = jnp.dot(x_ref[:], w_ref[0],
                     preferred_element_type=jnp.float32)  # [S*k2, W]
        wx3 = wx.reshape(S, k2, W)
        er = (wx3 * ar_ref[0, 0]).sum(axis=2)  # [S, k2]
        el = (wx3 * al_ref[0, 0]).sum(axis=2)[:, :1]
        s = jax.nn.leaky_relu(el + er, negative_slope=0.2)
        alpha = jax.nn.softmax(s, axis=1)  # [S, k2]
        # batched-dot einsum is not lowerable in Mosaic; broadcast-
        # multiply-reduce is
        out_ref[0] = (alpha[:, :, None] * wx3).sum(axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks, H),
        in_specs=[
            pl.BlockSpec((S * k2, D), lambda b, h: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, W), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, W), lambda b, h: (h, b, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def fused(x, w, al, ar):
        # x: [N, D]; w: [H, D, W]; al/ar: [H, 1, W]
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((H, n_blocks * S, W),
                                           jnp.float32),
        )(x, w, al, ar)

    return fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--interpret_check", action="store_true")
    args = ap.parse_args()

    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.small:
        n_seeds, k2, D, H, W = 2048, 10, 128, 4, 128
        args.block = min(args.block, 256)
    else:
        # the 62M-edge frontier GAT shape: b*k1 = 15360 seeds, k2 = 10,
        # raw feats 100 -> 128 lanes, 8 heads x 256 (the wide config)
        n_seeds, k2, D, H, W = 15_360, 10, 128, 8, 256
    S = args.block
    n_blocks = -(-n_seeds // S)
    n_seeds = n_blocks * S
    N = n_seeds * k2
    print("[probe] seeds=%d k2=%d D=%d heads=%d width=%d block=%d "
          "(wx hbm traffic if materialised: %.2f GB)"
          % (n_seeds, k2, D, H, W, S, N * H * W * 4 / 1e9), flush=True)

    rng = np.random.default_rng(0)
    x = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.float32))(
        jax.random.key(0))
    w = jnp.asarray(rng.standard_normal((H, D, W), np.float32) * 0.1)
    al = jnp.asarray(rng.standard_normal((H, 1, W), np.float32) * 0.1)
    ar = jnp.asarray(rng.standard_normal((H, 1, W), np.float32) * 0.1)

    def fwd_ref(x, w, al, ar):
        # unfused: Wx materialises [N, H, W]
        wx = jnp.einsum("nd,hdw->nhw", x, w)
        er = (wx * ar[:, 0][None]).sum(-1).reshape(n_seeds, k2, H)
        el = (wx * al[:, 0][None]).sum(-1).reshape(n_seeds, k2, H)[:, :1]
        s = jax.nn.leaky_relu(el + er, negative_slope=0.2)
        alpha = jax.nn.softmax(s, axis=1)  # [seeds, k2, H]
        wxs = wx.reshape(n_seeds, k2, H, W)
        return jnp.einsum("skh,skhw->hsw", alpha, wxs)

    ref_j = jax.jit(fwd_ref)

    @jax.jit
    def chunked(x, w, al, ar):
        xc = x.reshape(n_blocks, S * k2, D)

        def one(xb):
            wx = jnp.einsum("nd,hdw->nhw", xb, w)
            er = (wx * ar[:, 0][None]).sum(-1).reshape(S, k2, H)
            el = (wx * al[:, 0][None]).sum(-1).reshape(S, k2, H)[:, :1]
            s = jax.nn.leaky_relu(el + er, negative_slope=0.2)
            alpha = jax.nn.softmax(s, axis=1)
            return jnp.einsum("skh,skhw->hsw", alpha,
                              wx.reshape(S, k2, H, W))

        outs = jax.lax.map(one, xc)  # [n_blocks, H, S, W]
        return outs.transpose(1, 0, 2, 3).reshape(H, n_seeds, W)

    fused = make_pallas(S, k2, D, H, W, n_blocks)

    if args.interpret_check or jax.default_backend() == "cpu":
        from jax.experimental.pallas import tpu as pltpu
        want = ref_j(x, w, al, ar)
        got_c = chunked(x, w, al, ar)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        with pltpu.force_tpu_interpret_mode():
            got = fused(x, w, al, ar)
        np.testing.assert_allclose(
            np.asarray(got).reshape(H, n_seeds, W), np.asarray(want),
            rtol=2e-4, atol=2e-4)
        print("[probe] interpret-mode correctness OK", flush=True)
        return

    def timeit(fn, label):
        out = fn(x, w, al, ar)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _i in range(args.steps):
            out = fn(x, w, al, ar)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        print("%-26s %.3f ms" % (label, dt), flush=True)
        return dt

    t_bar = timeit(ref_j, "bar: unfused XLA fwd")
    timeit(chunked, "chunked: lax.map XLA fwd")
    t_f = timeit(fused, "pallas: fused fwd")
    # correctness on hardware
    want = ref_j(x, w, al, ar)
    got = fused(x, w, al, ar)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)
    print("[probe] hardware correctness OK; fused/bar = %.2fx"
          % (t_bar / t_f), flush=True)


if __name__ == "__main__":
    main()
