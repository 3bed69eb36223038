"""Big-graph frontier experiment: the 62M-edge config, f32 vs bf16 tables.

Runs bench.CFG_SCALE (ogbn-products size: 2.45M nodes / 62M edges, EgoSAGE
fanout [15,10], batch 1024, storage_profile=minimal) twice in ONE process
— float32 feature tables (the round-1/2 configuration that recorded
46.4M edges/s) and bfloat16 (halves the dominant hop-feature gather
traffic).  One process so the tunnel's one-time first-transfer penalty
(see PERF.md warmup section) is paid once and both measurements are
steady-state comparable.

Results land in PERF.md's "62M-edge frontier" table; the committed repro
for the winning config is `GLT_BENCH_SCALE=1 python bench.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from graph_learn_tpu.config import conf
from graph_learn_tpu.utils.platform import ensure_platform


def main():
    ensure_platform()
    conf.storage_profile = "minimal"
    if os.environ.get("GLT_USE_PALLAS") == "1":
        conf.use_pallas = True
    out = {}
    for dt in ("float32", "bfloat16"):
        conf.feature_dtype = dt
        t0 = time.time()
        eps = bench.run_bench(bench.CFG_SCALE)
        out[dt] = eps
        print(json.dumps({
            "metric": "ego_sage_scale62m_edges_per_s",
            "feature_dtype": dt,
            "value": round(eps, 1),
            "unit": "edges/s/chip",
            "vs_r2_record": round(eps / bench.SCALE_BASELINE_EPS, 2),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
    return out


if __name__ == "__main__":
    main()
