"""Profiling: jax.profiler traces + scope timers.

TPU-native replacement for the reference's compile-time PROFILING macro
(reference: common/base/profiling.h:24-70 — RAII scope timers dumping
key/latency/count at exit) and the TF trainer profiling hook
(examples/tf/trainer.py:54-64).  Device-side work shows up in the xplane
trace (tensorboard-compatible); host scopes use the same accumulate-and-
dump-at-exit pattern.
"""

from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

_stats: Dict[str, list] = defaultdict(lambda: [0.0, 0])
_dump_registered = False


@contextlib.contextmanager
def profiling(key: str):
    """Host scope timer (reference PROFILING(key))."""
    global _dump_registered
    if not _dump_registered:
        atexit.register(dump)
        _dump_registered = True
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _stats[key][0] += dt
        _stats[key][1] += 1


def dump():
    """Print accumulated latency/count per key (profiling.h Costage dump)."""
    for key, (total, count) in sorted(_stats.items()):
        print("[profiling] %s: total %.3fs, count %d, avg %.3fms"
              % (key, total, count, 1000.0 * total / max(count, 1)))


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/glt_trace"):
    """Capture a jax.profiler trace (open in tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the device trace."""
    return jax.profiler.TraceAnnotation(name)
