"""Built-store snapshot/restore: cold start without re-ingesting TSVs.

Reference capability: DGS restores serving workers from RocksDB backups +
kafka ready-offsets (reference: dynamic_graph_service/python/coordinator/
checkpoint.py:44-197, sample_store.h:40-54); GL itself always reloads
from source on restart (no store snapshot).  Here the BUILT host store —
id-remapped payload tables, ts-rebased edge lists, IdIndex inputs, node
sets, decoders — serializes to a directory of raw ``.npy`` files plus a
JSON manifest; restore loads them with ``mmap_mode="r"`` so a cold start
is IO-bound instead of parse-bound.  The online UpdateLog
(online/update.py) replays on top for freshness, mirroring DGS's
"backup + replay from offsets" recovery.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.core.store import (EdgeTable, GraphStore, NodeSet,
                                        NodeTable)
from graph_learn_tpu.errors import InvalidArgumentError

_FORMAT_VERSION = 1


def _decoder_cfg(dec: Decoder) -> dict:
    return {
        "weighted": dec.weighted,
        "labeled": dec.labeled,
        "timestamped": dec.timestamped,
        "attr_types": [list(t) if isinstance(t, (tuple, list)) else t
                       for t in dec.attr_types],
        "attr_dims": dec.attr_dims,
        "attr_delimiter": dec.attr_delimiter,
        "multival_max_len": dec.multival_max_len,
    }


def _decoder_from_cfg(cfg: dict) -> Decoder:
    return Decoder(
        weighted=cfg["weighted"], labeled=cfg["labeled"],
        timestamped=cfg["timestamped"],
        attr_types=[tuple(t) if isinstance(t, list) else t
                    for t in cfg["attr_types"]],
        attr_dims=cfg["attr_dims"],
        attr_delimiter=cfg["attr_delimiter"],
        multival_max_len=cfg["multival_max_len"])


class _ArrayWriter:
    def __init__(self, path: str):
        self.path = path
        self.n = 0

    def put(self, a: Optional[np.ndarray]) -> Optional[str]:
        if a is None:
            return None
        name = "a%05d.npy" % self.n
        self.n += 1
        np.save(os.path.join(self.path, name), np.ascontiguousarray(a))
        return name


def save_store(store: GraphStore, path: str) -> None:
    """Write the host store to ``path/`` (manifest.json + .npy arrays)."""
    os.makedirs(path, exist_ok=True)
    w = _ArrayWriter(path)
    man: Dict[str, object] = {"version": _FORMAT_VERSION,
                              "nodes": [], "edges": [], "node_sets": []}
    for t, nt in store.nodes.items():
        man["nodes"].append({
            "type": t,
            "decoder": _decoder_cfg(nt.decoder),
            "raw_ids": w.put(nt.raw_ids),
            "int_attrs": w.put(nt.int_attrs),
            "float_attrs": w.put(nt.float_attrs),
            "multival_attrs": w.put(nt.multival_attrs),
            "multival_lens": w.put(nt.multival_lens),
            "weights": w.put(nt.weights),
            "labels": w.put(nt.labels),
            "timestamps": w.put(nt.timestamps),
        })
    for t, et in store.edges.items():
        man["edges"].append({
            "type": t, "src_type": et.src_type, "dst_type": et.dst_type,
            "decoder": _decoder_cfg(et.decoder),
            "num_src_nodes": et.num_src_nodes,
            "num_dst_nodes": et.num_dst_nodes,
            "ts_base": et.ts_base, "ts_scale": et.ts_scale,
            "src": w.put(et.src), "dst": w.put(et.dst),
            "weights": w.put(et.weights), "labels": w.put(et.labels),
            "timestamps": w.put(et.timestamps),
            "int_attrs": w.put(et.int_attrs),
            "float_attrs": w.put(et.float_attrs),
            "multival_attrs": w.put(et.multival_attrs),
            "multival_lens": w.put(et.multival_lens),
        })
    for t, ns in store.node_sets.items():
        man["node_sets"].append({
            "type": t, "base_type": ns.base_type,
            "indices": w.put(ns.indices),
            "weights": w.put(ns.weights),
        })
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))


def load_store(path: str, mmap: bool = True) -> GraphStore:
    """Rebuild a GraphStore from ``save_store`` output.

    Arrays are memory-mapped by default — restore cost is the IdIndex
    argsort + degree bincounts, not IO or TSV parsing.  Timestamps are
    restored with their saved (base, scale) domain, bit-identical to the
    pre-snapshot store (unify_ts_bases already ran before the save).
    """
    mf = os.path.join(path, "manifest.json")
    if not os.path.exists(mf):
        raise InvalidArgumentError("no store snapshot at %r" % path)
    with open(mf) as f:
        man = json.load(f)
    if man.get("version") != _FORMAT_VERSION:
        raise InvalidArgumentError(
            "snapshot version %r unsupported" % man.get("version"))

    def rd(name):
        if name is None:
            return None
        return np.load(os.path.join(path, name),
                       mmap_mode="r" if mmap else None)

    store = GraphStore()
    for m in man["nodes"]:
        nt = NodeTable(m["type"], _decoder_from_cfg(m["decoder"]),
                       np.asarray(rd(m["raw_ids"])),
                       int_attrs=rd(m["int_attrs"]),
                       float_attrs=rd(m["float_attrs"]),
                       multival_attrs=rd(m["multival_attrs"]),
                       multival_lens=rd(m["multival_lens"]),
                       weights=rd(m["weights"]), labels=rd(m["labels"]),
                       timestamps=rd(m["timestamps"]))
        store.add_node_table(nt)
    for m in man["edges"]:
        ts = rd(m["timestamps"])
        et = EdgeTable(m["type"], m["src_type"], m["dst_type"],
                       _decoder_from_cfg(m["decoder"]),
                       src=np.asarray(rd(m["src"])),
                       dst=np.asarray(rd(m["dst"])),
                       num_src_nodes=m["num_src_nodes"],
                       num_dst_nodes=m["num_dst_nodes"],
                       int_attrs=rd(m["int_attrs"]),
                       float_attrs=rd(m["float_attrs"]),
                       multival_attrs=rd(m["multival_attrs"]),
                       multival_lens=rd(m["multival_lens"]),
                       weights=rd(m["weights"]), labels=rd(m["labels"]),
                       timestamps=None)
        if ts is not None:
            # saved timestamps are already rebased to (ts_base, ts_scale);
            # re-running __init__'s rebase would shift the domain
            et.timestamps = np.asarray(ts, np.int64)
            et.ts_base = int(m["ts_base"])
            et.ts_scale = int(m["ts_scale"])
            et._sort_key = et.timestamps.astype(np.float64)
            et._sort_desc = False
        store.add_edge_table(et)
    for m in man["node_sets"]:
        store.node_sets[m["type"]] = NodeSet(
            type_name=m["type"], base_type=m["base_type"],
            indices=np.asarray(rd(m["indices"]), np.int32),
            weights=rd(m["weights"]))
    return store
