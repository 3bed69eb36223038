"""Test config: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (mirrors the driver's dryrun_multichip environment)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# This image preimports jax and registers a TPU backend from sitecustomize
# before conftest runs; force a re-resolution onto CPU or every eager op
# round-trips through the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def tmp_graph_dir(tmp_path):
    """Write a small deterministic weighted/labeled/attributed graph.

    Mirrors the reference test-data generators
    (reference: graphlearn/python/tests/utils.py:27-60): node table with
    float attrs + label + weight, edge table with weight.
    """
    rng = np.random.default_rng(7)
    n = 40
    node_path = tmp_path / "node_table"
    edge_path = tmp_path / "edge_table"
    train_path = tmp_path / "train_table"
    with open(node_path, "w") as f:
        f.write("id:int64\tweight:float\tlabel:int64\tfeature:string\n")
        for i in range(n):
            feats = ":".join(str(round(x, 4)) for x in rng.random(4))
            f.write(f"{i * 10}\t{i * 0.1:.2f}\t{i % 5}\t{feats}\n")
    edges = []
    with open(edge_path, "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for i in range(n):
            deg = 1 + (i % 7)
            for j in range(deg):
                dst = ((i * 3 + j * 11) % n)
                w = (j + 1) * 0.5
                edges.append((i * 10, dst * 10, w))
                f.write(f"{i * 10}\t{dst * 10}\t{w}\n")
    with open(train_path, "w") as f:
        f.write("id:int64\tweight:float\n")
        for i in range(0, n, 2):
            f.write(f"{i * 10}\t1.0\n")
    return {
        "dir": tmp_path, "node": str(node_path), "edge": str(edge_path),
        "train": str(train_path), "n": n, "edge_list": edges,
    }
