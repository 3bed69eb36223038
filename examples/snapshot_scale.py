"""Measure built-store snapshot/restore at the 62M-edge scale config.

The VERDICT r4 criterion for Graph.save/load: the 62M host build
(57.5s TSV-free in-memory build in BENCH_r04; TSV ingest is larger)
should drop to IO-bound seconds on restore.  This harness measures, on
the host only (no device traffic):

  build     synthesize + construct the 62M-edge store (the cost a cold
            start pays WITHOUT a snapshot; TSV-parse paths pay more)
  save      Graph.save() -> .npy bundle
  load      Graph.load() (mmap) + a real query compile/run touch so
            lazily-materialised arrays actually fault in

Usage: python examples/snapshot_scale.py [--small] [--dir PATH]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from graph_learn_tpu.utils.platform import ensure_platform
    ensure_platform()
    from graph_learn_tpu.config import conf

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--dir", default="/tmp/glt_snapshot_scale")
    args = ap.parse_args()
    cfg = dict(bench.CFG if args.small else bench.CFG_SCALE)
    if not args.small:
        conf.storage_profile = "minimal"

    t0 = time.perf_counter()
    g, dec = bench.build_graph_inmem(cfg)
    t_build = time.perf_counter() - t0
    print("build  %6.1fs  (%d nodes / %d edges)"
          % (t_build, cfg["n_nodes"], cfg["n_nodes"] * cfg["avg_degree"]),
          flush=True)

    if os.path.isdir(args.dir):
        # only clobber a directory that IS a prior snapshot — never an
        # arbitrary (e.g. mistyped) existing path
        if not os.path.exists(os.path.join(args.dir, "manifest.json")):
            raise SystemExit(
                "--dir %r exists and is not a snapshot directory (no "
                "manifest.json); refusing to delete it" % args.dir)
        shutil.rmtree(args.dir)
    t0 = time.perf_counter()
    g.save(args.dir)
    t_save = time.perf_counter() - t0
    nbytes = sum(os.path.getsize(os.path.join(args.dir, f))
                 for f in os.listdir(args.dir))
    print("save   %6.1fs  (%.2f GB, %.0f MB/s)"
          % (t_save, nbytes / 1e9, nbytes / 1e6 / t_save), flush=True)

    import graph_learn_tpu as gl
    t0 = time.perf_counter()
    g2 = gl.Graph.load(args.dir)
    t_load = time.perf_counter() - t0
    print("load   %6.1fs  (mmap restore; %.1fx faster than build)"
          % (t_load, t_build / max(t_load, 1e-9)), flush=True)

    # touch: one real sampled batch from the restored store
    t0 = time.perf_counter()
    q = (g2.V("item").batch(256).alias("src")
         .outV("rel").sample(5).by("random").alias("h1").values())
    out = gl.Dataset(q, window=1).next()
    assert out["h1"].ids.shape == (256, 5)
    print("touch  %6.1fs  (first sampled batch incl. device tables)"
          % (time.perf_counter() - t0), flush=True)


if __name__ == "__main__":
    main()
