"""TSV table ingest -> host numpy arrays.

Parity with the reference IO layer (reference: graphlearn/src/core/io/
edge_loader.cc:122-190, node_loader.cc, parser.cc:39-99,
local_file_system.cc:90-149):

- first line of every table is a typed schema header (``id:int64\tweight:float``)
- node record columns: id, [weight], [label], [timestamp], [attr-string]
- edge record columns: src_id, dst_id, [weight], [label], [timestamp],
  [attr-string]; undirected sources additionally load a reversed copy with
  src/dst swapped (edge_loader.cc:66, python/graph.py:357-381)
- the attr-string holds attr_delimiter-joined values; string attrs with a
  hash bucket are hashed at ingest (parser.cc:86-93), so device tables are
  purely numeric

The default parser is numpy-vectorised Python; ``graph_learn_tpu.csrc``
provides a C++ fast path for large tables (see csrc/ingest.cpp) that this
module uses automatically when the shared library is built.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.errors import InvalidArgumentError

# FNV-1a 64-bit, vectorisable and mirrored by the C++ loader.
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def hash64(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a).

    Stands in for the reference's Hash64 (common/base/hash.cc) — exact
    values differ but determinism and distribution match the use cases
    (bucket hashing at parser.cc:30-33).
    """
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) % (1 << 64))
    return int(h)


def hash64_array(strs: Sequence[str]) -> np.ndarray:
    """Vectorised FNV-1a over a sequence of strings -> uint64 array."""
    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        out[i] = hash64(s)
    return out


def _read_lines(path: str) -> Tuple[List[str], List[str]]:
    """Returns (header_fields, data_lines)."""
    with open(path, "r") as f:
        header = f.readline().rstrip("\n")
        data = f.read().splitlines()
    delim = conf.field_delimiter
    return header.split(delim), data


def _split_columns(lines: List[str], ncols: int) -> List[List[str]]:
    delim = conf.field_delimiter
    cols: List[List[str]] = [[] for _ in range(ncols)]
    for ln in lines:
        if not ln:
            continue
        parts = ln.split(delim)
        if len(parts) != ncols:
            raise InvalidArgumentError(
                "record has %d fields, expected %d: %r" % (len(parts), ncols, ln))
        for c in range(ncols):
            cols[c].append(parts[c])
    return cols


def _parse_attrs(attr_col: List[str], decoder: Decoder):
    """attr-string column -> (int_attrs, float_attrs, multival, mv_lens)."""
    n = len(attr_col)
    delim = decoder.attr_delimiter
    n_attr = len(decoder.attrs)
    # split all records into a [n, n_attr] object grid
    grid: List[List[str]] = []
    for s in attr_col:
        parts = s.split(delim)
        if len(parts) != n_attr:
            raise InvalidArgumentError(
                "attribute count %d != decoder %d in %r" % (len(parts), n_attr, s))
        grid.append(parts)

    int_cols, float_cols = [], []
    mv_cols, mv_len_cols = [], []
    for a in decoder.attrs:
        vals = [g[a.index] for g in grid]
        if a.is_multival:
            L = decoder.multival_max_len
            ids = np.zeros((n, L), dtype=np.int32)
            lens = np.zeros((n,), dtype=np.int32)
            bucket = a.bucket_size or (1 << 31) - 1
            for i, v in enumerate(vals):
                items = [x for x in v.split(",") if x] if v else []
                lens[i] = min(len(items), L)
                for j, it in enumerate(items[:L]):
                    ids[i, j] = hash64(it) % bucket
            mv_cols.append(ids)
            mv_len_cols.append(lens)
        elif a.is_numeric:
            try:
                col = np.asarray(vals, dtype=np.float32)
            except ValueError as e:
                raise InvalidArgumentError(
                    "attribute %d expects numeric: %s" % (a.index, e))
            float_cols.append(col)
        else:
            # embedding id column: int (optionally bucketed) or hashed string
            if a.type_name == "int":
                col = np.asarray(vals, dtype=np.int64)
                if a.bucket_size:
                    col = col % a.bucket_size
            else:  # string
                bucket = a.bucket_size or (1 << 31) - 1
                col = (hash64_array(vals) % np.uint64(bucket)).astype(np.int64)
            int_cols.append(col.astype(np.int32))

    int_attrs = np.stack(int_cols, axis=1) if int_cols else None
    float_attrs = np.stack(float_cols, axis=1) if float_cols else None
    multival = np.stack(mv_cols, axis=1) if mv_cols else None
    mv_lens = np.stack(mv_len_cols, axis=1) if mv_len_cols else None
    return int_attrs, float_attrs, multival, mv_lens


def _try_native_load(path: str, n_id_cols: int, decoder: Decoder):
    """Use the C++ loader when available and applicable."""
    try:
        from graph_learn_tpu.csrc import native_ingest
    except Exception:
        return None
    return native_ingest.load_table(path, n_id_cols, decoder)


def load_node_table(path: str, decoder: Decoder) -> Dict[str, Optional[np.ndarray]]:
    """Parse a node TSV -> dict of numpy columns."""
    from graph_learn_tpu.core.filesystem import resolve_path
    path = resolve_path(path)
    native = _try_native_load(path, 1, decoder)
    if native is not None:
        return native
    header, lines = _read_lines(path)
    ncols = 1 + decoder.weighted + decoder.labeled + decoder.timestamped + \
        (1 if decoder.attributed else 0)
    if len(header) != ncols:
        # tolerate extra header columns but data must match decoder
        pass
    cols = _split_columns(lines, ncols)
    c = 0
    out: Dict[str, Optional[np.ndarray]] = {}
    out["ids"] = np.asarray(cols[c], dtype=np.int64); c += 1
    out["weights"] = np.asarray(cols[c], np.float32) if decoder.weighted else None
    c += decoder.weighted
    out["labels"] = np.asarray(cols[c], np.int64).astype(np.int32) if decoder.labeled else None
    c += decoder.labeled
    out["timestamps"] = np.asarray(cols[c], np.int64) if decoder.timestamped else None
    c += decoder.timestamped
    if decoder.attributed:
        ia, fa, mv, ml = _parse_attrs(cols[c], decoder)
    else:
        ia = fa = mv = ml = None
    out["int_attrs"], out["float_attrs"] = ia, fa
    out["multival_attrs"], out["multival_lens"] = mv, ml
    return out


def load_edge_table(path: str, decoder: Decoder) -> Dict[str, Optional[np.ndarray]]:
    """Parse an edge TSV -> dict of numpy columns (raw src/dst ids)."""
    from graph_learn_tpu.core.filesystem import resolve_path
    path = resolve_path(path)
    native = _try_native_load(path, 2, decoder)
    if native is not None:
        return native
    header, lines = _read_lines(path)
    ncols = 2 + decoder.weighted + decoder.labeled + decoder.timestamped + \
        (1 if decoder.attributed else 0)
    cols = _split_columns(lines, ncols)
    c = 0
    out: Dict[str, Optional[np.ndarray]] = {}
    out["src_ids"] = np.asarray(cols[c], dtype=np.int64); c += 1
    out["dst_ids"] = np.asarray(cols[c], dtype=np.int64); c += 1
    out["weights"] = np.asarray(cols[c], np.float32) if decoder.weighted else None
    c += decoder.weighted
    out["labels"] = np.asarray(cols[c], np.int64).astype(np.int32) if decoder.labeled else None
    c += decoder.labeled
    out["timestamps"] = np.asarray(cols[c], np.int64) if decoder.timestamped else None
    c += decoder.timestamped
    if decoder.attributed:
        ia, fa, mv, ml = _parse_attrs(cols[c], decoder)
    else:
        ia = fa = mv = ml = None
    out["int_attrs"], out["float_attrs"] = ia, fa
    out["multival_attrs"], out["multival_lens"] = mv, ml
    return out
