"""ogbl-collab -> the reference's SEAL TSV table layout.

Mirrors the reference prep (reference: graphlearn/examples/data/
ogbl_collab.py — train/val/test edge tables with weights, node table with
128 float features, val/test negative-edge tables) so `examples/seal.py
--data_dir <out>` can target the reference's hits@50≈0.49 run
(seal/README.md:19-21) once the OGB data is mountable (no egress here).

`write_collab_tables` takes plain arrays so it is testable without the
`ogb` package; `prepare_from_ogb` wraps it when ogb + data are available.
"""

import argparse
import os

import numpy as np


def write_collab_tables(out_dir, train_edge, train_weight, valid_edge,
                        valid_neg, test_edge, test_neg, node_feat):
    """Write the six reference-layout tables from in-memory arrays."""
    os.makedirs(out_dir, exist_ok=True)

    def edges(name, e, w=None):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("src_id:int64\tdst_id:int64\tweight:float\n")
            for i in range(len(e)):
                f.write("%d\t%d\t%s\n" % (
                    e[i, 0], e[i, 1],
                    str(w[i]) if w is not None else "1.0"))

    edges("ogbl_collab_train_edge", train_edge, train_weight)
    edges("ogbl_collab_val_edge", valid_edge)
    edges("ogbl_collab_test_edge", test_edge)
    edges("ogbl_collab_val_edge_neg", valid_neg)
    edges("ogbl_collab_test_edge_neg", test_neg)
    with open(os.path.join(out_dir, "ogbl_collab_node"), "w") as f:
        f.write("id:int64\tfeature:string\n")
        for i in range(node_feat.shape[0]):
            f.write("%d\t%s\n" % (i, ":".join(map(str, node_feat[i]))))
    return out_dir


def prepare_from_ogb(out_dir: str) -> str:
    """Requires the `ogb` package and egress (or a pre-populated ogb root)."""
    from ogb.linkproppred import LinkPropPredDataset

    ds = LinkPropPredDataset(name="ogbl-collab")
    split = ds.get_edge_split()
    tr, va, te = split["train"], split["valid"], split["test"]
    graph = ds[0]
    return write_collab_tables(
        out_dir, tr["edge"], tr["weight"], va["edge"], va["edge_neg"],
        te["edge"], te["edge_neg"], np.asarray(graph["node_feat"]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/glt_ogbl_collab")
    args = ap.parse_args()
    prepare_from_ogb(args.out_dir)
    print("wrote reference-layout tables to", args.out_dir)
