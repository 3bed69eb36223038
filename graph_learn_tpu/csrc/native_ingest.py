"""ctypes wrapper over the native TSV loader (csrc/ingest.cpp).

Builds the shared library on first use with g++ (cached beside the source);
falls back silently when a toolchain is unavailable — core/ingest.py then
uses the pure-python parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

from graph_learn_tpu.config import conf
from graph_learn_tpu.core.schema import Decoder
from graph_learn_tpu.errors import InvalidArgumentError

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "ingest.cpp")
_SO = os.path.join(_REPO_ROOT, "csrc", "build", "libglt_ingest.so")

_lock = threading.Lock()
_lib = None
_build_failed = False

# kinds must match AttrKind in ingest.cpp
K_FLOAT, K_INT_NUMERIC, K_INT_ID, K_STRING_HASH, K_MULTIVAL = range(5)


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_SRC):
        return None
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               "-pthread", _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO)
    lib.glt_count_rows.restype = ctypes.c_int64
    lib.glt_count_rows.argtypes = [ctypes.c_char_p]
    lib.glt_parse_table.restype = ctypes.c_int32
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
    return _lib


def _attr_spec(decoder: Decoder):
    kinds, buckets = [], []
    for a in decoder.attrs:
        if a.is_multival:
            kinds.append(K_MULTIVAL)
            buckets.append(a.bucket_size or 0)
        elif a.is_numeric:
            kinds.append(K_FLOAT if a.type_name == "float" else K_INT_NUMERIC)
            buckets.append(0)
        elif a.type_name == "int":
            kinds.append(K_INT_ID)
            buckets.append(a.bucket_size or 0)
        else:
            kinds.append(K_STRING_HASH)
            buckets.append(a.bucket_size or 0)
    return (np.asarray(kinds, np.int32), np.asarray(buckets, np.int64))


def _ptr(a: Optional[np.ndarray], ctype):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def load_table(path: str, n_id_cols: int,
               decoder: Decoder) -> Optional[Dict[str, Optional[np.ndarray]]]:
    """Returns the same dict shape as core/ingest.load_*_table, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    n = lib.glt_count_rows(path.encode())
    if n < 0:
        raise InvalidArgumentError("cannot read table %r" % path)

    nf = decoder.float_attr_num
    ni = decoder.int_attr_num
    nm = decoder.multival_attr_num
    L = decoder.multival_max_len

    ids0 = np.empty(n, np.int64)
    ids1 = np.empty(n, np.int64) if n_id_cols == 2 else None
    weights = np.empty(n, np.float32) if decoder.weighted else None
    labels = np.empty(n, np.int32) if decoder.labeled else None
    ts = np.empty(n, np.int64) if decoder.timestamped else None
    fa = np.empty((n, nf), np.float32) if nf else None
    ia = np.empty((n, ni), np.int32) if ni else None
    mv = np.zeros((n, nm, L), np.int32) if nm else None  # tail stays zero
    ml = np.empty((n, nm), np.int32) if nm else None

    kinds, buckets = _attr_spec(decoder)
    rc = lib.glt_parse_table(
        path.encode(),
        ctypes.c_int32(n_id_cols), ctypes.c_int32(int(decoder.weighted)),
        ctypes.c_int32(int(decoder.labeled)),
        ctypes.c_int32(int(decoder.timestamped)),
        ctypes.c_int32(len(decoder.attrs)),
        _ptr(kinds, ctypes.c_int32), _ptr(buckets, ctypes.c_int64),
        ctypes.c_int32(L),
        ctypes.c_char(conf.field_delimiter.encode()),
        ctypes.c_char(decoder.attr_delimiter.encode()),
        ctypes.c_int64(n),
        _ptr(ids0, ctypes.c_int64), _ptr(ids1, ctypes.c_int64),
        _ptr(weights, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        _ptr(ts, ctypes.c_int64), _ptr(fa, ctypes.c_float),
        _ptr(ia, ctypes.c_int32), _ptr(mv, ctypes.c_int32),
        _ptr(ml, ctypes.c_int32),
        ctypes.c_int32(nf), ctypes.c_int32(ni), ctypes.c_int32(nm),
        ctypes.c_int32(os.cpu_count() or 1))
    if rc != 0:
        raise InvalidArgumentError(
            "native parse failed (%d) for %r — schema mismatch?" % (rc, path))

    out: Dict[str, Optional[np.ndarray]] = {
        "weights": weights, "labels": labels, "timestamps": ts,
        "int_attrs": ia, "float_attrs": fa,
        "multival_attrs": mv, "multival_lens": ml,
    }
    if n_id_cols == 2:
        out["src_ids"], out["dst_ids"] = ids0, ids1
    else:
        out["ids"] = ids0
    return out
