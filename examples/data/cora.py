"""Real Cora -> the reference's TSV table layout.

Mirrors what graphlearn's prep script produces
(reference: graphlearn/examples/data/cora.py — node_table with
row-normalized features + integer labels, edge_table_with_self_loop,
train/val/test id tables split 0:140 / 200:500 / 500:1500) so
`ego_sage_supervised.py --data_dir <out>` reproduces the reference's
Cora ACC≈0.80 run (ego_sage/README.md:38-40) the moment raw data is
mountable.  No network access is attempted unless --download is given
(this environment has zero egress).

Input: raw `cora.content` (id  w1..w1433  label) and `cora.cites`
(cited  citing) from the standard Cora distribution.

Usage:
  python examples/data/cora.py --raw_dir /path/with/cora.content --out_dir /tmp/cora
"""

import argparse
import os

import numpy as np

CORA_URL = "https://graphlearn.oss-cn-hangzhou.aliyuncs.com/data/github/cora.zip"


def prepare_cora(raw_dir: str, out_dir: str) -> str:
    """Convert raw cora.content/cora.cites to the reference TSV layout."""
    os.makedirs(out_dir, exist_ok=True)
    content = np.genfromtxt(os.path.join(raw_dir, "cora.content"),
                            dtype=np.dtype(str))
    ids = content[:, 0].astype(np.int64)
    feats = content[:, 1:-1].astype(np.float32)
    # row-normalize (reference cora.py feature_normalize)
    row_sum = feats.sum(axis=1, keepdims=True)
    feats = feats / np.where(row_sum == 0, 1.0, row_sum)
    classes = sorted(set(content[:, -1]))
    cls_map = {c: i for i, c in enumerate(classes)}
    labels = np.array([cls_map[c] for c in content[:, -1]], np.int64)

    with open(os.path.join(out_dir, "node_table"), "w") as f:
        f.write("id:int64\tlabel:int64\tfeature:string\n")
        for i in range(ids.shape[0]):
            f.write("%d\t%d\t%s\n" % (
                ids[i], labels[i],
                ":".join(map(str, feats[i]))))

    # reference splits: first 140 train, 200:500 val, 500:1500 test
    n = ids.shape[0]
    splits = {"train_table": range(0, min(140, n)),
              "val_table": range(min(200, n), min(500, n)),
              "test_table": range(min(500, n), min(1500, n))}
    for name, rng in splits.items():
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("id:int64\tweight:float\n")
            for i in rng:
                f.write("%d\t1.0\n" % ids[i])

    cites = np.genfromtxt(os.path.join(raw_dir, "cora.cites"),
                          dtype=np.int64).reshape(-1, 2)
    # edge_table_with_self_loop: all non-self citation edges + one
    # self-loop per node (the table the reference trains on)
    with open(os.path.join(out_dir, "edge_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for s, d in cites:
            if s != d:
                f.write("%d\t%d\t0.0\n" % (s, d))
        for i in ids:
            f.write("%d\t%d\t0.0\n" % (i, i))
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", required=True,
                    help="dir containing cora.content + cora.cites")
    ap.add_argument("--out_dir", default="/tmp/glt_cora")
    ap.add_argument("--download", action="store_true",
                    help="fetch the zip first (needs egress)")
    args = ap.parse_args()
    if args.download:
        import io
        import zipfile
        from urllib import request
        os.makedirs(args.raw_dir, exist_ok=True)
        with request.urlopen(CORA_URL, timeout=120) as r:
            zipfile.ZipFile(io.BytesIO(r.read())).extractall(args.raw_dir)
        # the zip nests under cora/
        nested = os.path.join(args.raw_dir, "cora")
        if os.path.exists(os.path.join(nested, "cora.content")):
            args.raw_dir = nested
    prepare_cora(args.raw_dir, args.out_dir)
    print("wrote reference-layout tables to", args.out_dir)


if __name__ == "__main__":
    main()
