"""ogbn-products -> the reference's TSV table layout.

Produces the same node/edge/split tables the Cora prep writes
(reference: graphlearn/examples/data/cora.py layout — node_table with
float features + integer labels, edge_table, train/val/test id tables)
from the OGB ogbn-products distribution, so
`examples/ego_sage_supervised.py --data_dir <out> --features_num 100
--classes 47` runs the multi-host-scale node-classification config of
BASELINE.md the moment the data is mountable (zero egress here).

Two inputs are accepted:
- ``--raw_dir``: OGB's raw csv.gz layout (products/raw/node-feat.csv.gz,
  node-label.csv.gz, edge.csv.gz + split/sales_ranking/{train,valid,
  test}.csv.gz) — read with gzip+numpy, no ogb package needed.
- ``prepare_from_ogb(out_dir)``: via the ogb package when present.

`write_products_tables` takes plain arrays so the layout is testable on
miniature data (tests/test_real_datasets.py).
"""

import argparse
import gzip
import os

import numpy as np


def write_products_tables(out_dir, node_feat, node_label, edges,
                          train_idx, valid_idx, test_idx):
    """Write node/edge/split tables in the reference layout."""
    os.makedirs(out_dir, exist_ok=True)
    n = node_feat.shape[0]
    with open(os.path.join(out_dir, "node_table"), "w") as f:
        f.write("id:int64\tlabel:int64\tfeature:string\n")
        for i in range(n):
            f.write("%d\t%d\t%s\n" % (
                i, int(node_label[i]),
                ":".join("%.6g" % x for x in node_feat[i])))
    with open(os.path.join(out_dir, "edge_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for s, d in edges:
            f.write("%d\t%d\t1.0\n" % (s, d))
    for name, idx in (("train_table", train_idx), ("val_table", valid_idx),
                      ("test_table", test_idx)):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("id:int64\tweight:float\n")
            for i in idx:
                f.write("%d\t1.0\n" % i)
    return out_dir


def _read_csv_gz(path, dtype):
    with gzip.open(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def prepare_products(raw_dir: str, out_dir: str) -> str:
    """OGB raw csv.gz layout -> reference tables (no ogb package)."""
    feat = _read_csv_gz(os.path.join(raw_dir, "node-feat.csv.gz"),
                        np.float32)
    label = _read_csv_gz(os.path.join(raw_dir, "node-label.csv.gz"),
                         np.int64).reshape(-1)
    edges = _read_csv_gz(os.path.join(raw_dir, "edge.csv.gz"), np.int64)
    split_dir = os.path.join(os.path.dirname(raw_dir), "split",
                             "sales_ranking")
    if not os.path.isdir(split_dir):
        split_dir = os.path.join(raw_dir, "split")  # tolerate flat layout

    def idxs(name):
        return _read_csv_gz(os.path.join(split_dir, name + ".csv.gz"),
                            np.int64).reshape(-1)

    return write_products_tables(out_dir, feat, label, edges,
                                 idxs("train"), idxs("valid"), idxs("test"))


def prepare_from_ogb(out_dir: str) -> str:
    """Requires the `ogb` package and egress (or a pre-populated root)."""
    from ogb.nodeproppred import NodePropPredDataset

    ds = NodePropPredDataset(name="ogbn-products")
    split = ds.get_idx_split()
    graph, label = ds[0]
    return write_products_tables(
        out_dir, graph["node_feat"], label.reshape(-1),
        graph["edge_index"].T, split["train"], split["valid"],
        split["test"])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", help="OGB products/raw dir (csv.gz files)")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--use_ogb", action="store_true",
                    help="use the ogb package instead of raw csv.gz")
    a = ap.parse_args()
    if a.use_ogb:
        prepare_from_ogb(a.out_dir)
    else:
        prepare_products(a.raw_dir, a.out_dir)
    print("wrote", a.out_dir)
