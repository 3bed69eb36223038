"""Pluggable source filesystems: scheme-registered fetchers.

Parity with the reference platform FS abstraction
(reference: graphlearn/src/platform/file_system.h FileSystem registry;
local FS platform/local/local_file_system.cc; HDFS via dlopen'd libhdfs,
platform/hadoop/hadoop_file_system.cc:69-86).

TPU-host redesign: ingest is a one-shot bulk load into HBM (not a
streaming server), so the contract is simply *fetch to a local path*:
``register_filesystem("hdfs", fetch)`` where ``fetch(url) -> local_path``
(download, mount, or cache however you like).  Both the python parser and
the mmap'ing native C++ loader then run unchanged on the local file.
``file://`` is built in; bare paths are local.  (This image has no
libhdfs and no egress, so no HDFS fetcher ships — the hook is the
capability.)
"""

from __future__ import annotations

from typing import Callable, Dict

from graph_learn_tpu.errors import NotFoundError

_SCHEMES: Dict[str, Callable[[str], str]] = {}


def register_filesystem(scheme: str, fetch: Callable[[str], str]) -> None:
    """Register ``fetch(url) -> local_path`` for ``scheme://`` sources."""
    _SCHEMES[scheme] = fetch


def resolve_path(path: str) -> str:
    """Map a source path/URL to a local file path."""
    if "://" not in path:
        return path
    scheme, rest = path.split("://", 1)
    if scheme == "file":
        return "/" + rest.lstrip("/") if not rest.startswith("/") else rest
    if scheme in _SCHEMES:
        return _SCHEMES[scheme](path)
    raise NotFoundError(
        "no filesystem registered for scheme %r (register_filesystem)"
        % scheme)
