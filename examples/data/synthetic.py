"""Synthetic dataset generators writing reference-format TSV tables.

The build environment has no network egress, so the reference's download
scripts (reference: graphlearn/examples/data/cora.py, u2i etc.) are
replaced with planted-structure generators whose tasks a GNN genuinely has
to learn:

- ``cora_like``: homophilous SBM graph with class-correlated noisy
  features — node classification needs neighbor aggregation to denoise.
- ``u2i``: bipartite user-item graph with latent preference clusters —
  link prediction with in-batch negatives (reference u2i generated data).

Table formats match the reference exactly (typed headers; attr column
':'-joined; train/val/test id tables).
"""

from __future__ import annotations

import os

import numpy as np


def cora_like(out_dir: str, n: int = 1000, classes: int = 7,
              feat_dim: int = 64, avg_degree: int = 8,
              homophily: float = 0.85, feat_noise: float = 2.0,
              train_frac: float = 0.3, val_frac: float = 0.2,
              seed: int = 0):
    """Writes node_table/edge_table/train_table/val_table/test_table."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    labels = rng.integers(0, classes, n)
    centers = rng.normal(0, 1, (classes, feat_dim))
    feats = centers[labels] + rng.normal(0, feat_noise, (n, feat_dim))
    feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)

    m = n * avg_degree // 2
    src = rng.integers(0, n, 4 * m)
    dst = rng.integers(0, n, 4 * m)
    same = labels[src] == labels[dst]
    keep_same = same & (rng.random(4 * m) < homophily)
    keep_diff = (~same) & (rng.random(4 * m) < (1 - homophily) / max(classes - 1, 1))
    keep = (keep_same | keep_diff) & (src != dst)
    src, dst = src[keep][:m], dst[keep][:m]

    with open(os.path.join(out_dir, "node_table"), "w") as f:
        f.write("id:int64\tlabel:int64\tfeature:string\n")
        for i in range(n):
            f.write("%d\t%d\t%s\n"
                    % (i, labels[i], ":".join("%.5f" % x for x in feats[i])))
    with open(os.path.join(out_dir, "edge_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for s, d in zip(src, dst):
            f.write("%d\t%d\t1.0\n" % (s, d))
    perm = rng.permutation(n)
    n_train = int(n * train_frac)
    n_val = int(n * val_frac)
    splits = {
        "train_table": perm[:n_train],
        "val_table": perm[n_train:n_train + n_val],
        "test_table": perm[n_train + n_val:],
    }
    for name, ids in splits.items():
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("id:int64\tweight:float\n")
            for i in sorted(ids):
                f.write("%d\t1.0\n" % i)
    return {"n": n, "classes": classes, "feat_dim": feat_dim,
            "num_edges": len(src)}


def u2i(out_dir: str, n_users: int = 500, n_items: int = 300,
        n_clusters: int = 5, edges_per_user: int = 10,
        feat_dim: int = 16, seed: int = 0):
    """Bipartite user-item graph (reference examples u2i generated data)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    u_cluster = rng.integers(0, n_clusters, n_users)
    i_cluster = rng.integers(0, n_clusters, n_items)
    u_feat = rng.normal(0, 1, (n_users, feat_dim)) + \
        3.0 * np.eye(n_clusters)[u_cluster] @ rng.normal(0, 1, (n_clusters, feat_dim))
    i_feat = rng.normal(0, 1, (n_items, feat_dim)) + \
        3.0 * np.eye(n_clusters)[i_cluster] @ rng.normal(0, 1, (n_clusters, feat_dim))

    srcs, dsts = [], []
    item_by_cluster = [np.where(i_cluster == c)[0] for c in range(n_clusters)]
    for u in range(n_users):
        pool = item_by_cluster[u_cluster[u]]
        if pool.size == 0:
            pool = np.arange(n_items)
        picks = rng.choice(pool, size=min(edges_per_user, pool.size),
                           replace=False)
        srcs.extend([u] * len(picks))
        dsts.extend(picks.tolist())

    def write_nodes(name, count, feats):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("id:int64\tfeature:string\n")
            for i in range(count):
                f.write("%d\t%s\n" % (i, ":".join("%.5f" % x for x in feats[i])))

    write_nodes("user_table", n_users, u_feat)
    write_nodes("item_table", n_items, i_feat)
    with open(os.path.join(out_dir, "u2i_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for s, d in zip(srcs, dsts):
            f.write("%d\t%d\t1.0\n" % (s, d))
    # item-item co-cluster edges (reference i-i edges in bipartite_sage)
    with open(os.path.join(out_dir, "i2i_table"), "w") as f:
        f.write("src_id:int64\tdst_id:int64\tweight:float\n")
        for c in range(n_clusters):
            items = item_by_cluster[c]
            for i in items:
                nbrs = rng.choice(items, size=min(5, items.size), replace=False)
                for j in nbrs:
                    if i != j:
                        f.write("%d\t%d\t1.0\n" % (i, j))
    return {"n_users": n_users, "n_items": n_items,
            "num_edges": len(srcs), "feat_dim": feat_dim}


def temporal_u2i(out_dir: str, n_users: int = 300, n_items: int = 200,
                 n_clusters: int = 4, events: int = 6000,
                 feat_dim: int = 8, edge_feat_dim: int = 4, seed: int = 0):
    """Temporal bipartite event stream (JODIE-style, reference ego_tgat).

    Emits user/item tables with float features and interaction/train/val/
    test event tables (``src dst ts edge_attrs``) split chronologically.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    cu = rng.integers(0, n_clusters, n_users)
    ci = rng.integers(0, n_clusters, n_items)
    centers = rng.normal(0, 2.0, (n_clusters, feat_dim))
    u_feat = centers[cu] + rng.normal(0, 0.6, (n_users, feat_dim))
    i_feat = centers[ci] + rng.normal(0, 0.6, (n_items, feat_dim))

    def write_nodes(name, count, feats):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("id:int64\tfeature:string\n")
            for i in range(count):
                f.write("%d\t%s\n" %
                        (i, ":".join("%.5f" % x for x in feats[i])))

    write_nodes("user_table", n_users, u_feat)
    write_nodes("item_table", n_items, i_feat)

    item_by_cluster = [np.where(ci == c)[0] for c in range(n_clusters)]
    rows = []
    for t in range(events):
        u = int(rng.integers(0, n_users))
        pool = item_by_cluster[cu[u]]
        i = int(pool[rng.integers(0, pool.size)]) if pool.size else \
            int(rng.integers(0, n_items))
        ef = rng.normal(0, 1, edge_feat_dim)
        rows.append((u, i, 1600000000 + t * 60, ef))

    def write_events(name, subset):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("src_id:int64\tdst_id:int64\ttimestamp:int64"
                    "\tfeature:string\n")
            for u, i, ts, ef in subset:
                f.write("%d\t%d\t%d\t%s\n" %
                        (u, i, ts, ":".join("%.5f" % x for x in ef)))

    n_tr = int(events * 0.7)
    n_va = int(events * 0.85)
    write_events("interaction_table", rows)
    write_events("train_table", rows[:n_tr])
    write_events("val_table", rows[n_tr:n_va])
    write_events("test_table", rows[n_va:])
    return {"n_users": n_users, "n_items": n_items, "events": events,
            "feat_dim": feat_dim, "edge_feat_dim": edge_feat_dim}
