"""Multi-process bootstrap: jax.distributed in place of coordinator/naming.

The reference's cluster lifecycle — FS/RPC Coordinator state machine
(service/dist/coordinator.h:34-120), NamingEngine endpoint registry
(fs_naming_engine.cc), readiness gating (grpc_service.cc:50-58) — is
subsumed by ``jax.distributed.initialize``: one call wires every process
into a single mesh; barriers are collectives; "endpoints" are mesh
coordinates.
"""

from __future__ import annotations

import os
from typing import Optional


def init_cluster(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None):
    """Initialise multi-process JAX (no-op when single-process).

    Env fallbacks mirror the reference's cluster-spec parsing
    (python/cluster.py get_cluster): GLT_COORDINATOR, GLT_NUM_PROCS,
    GLT_PROC_ID.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "GLT_COORDINATOR")
    if coordinator_address is None:
        return False  # single-process
    num_processes = int(num_processes
                        or os.environ.get("GLT_NUM_PROCS", "1"))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("GLT_PROC_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def barrier(name: str = "sync"):
    """Cluster-wide barrier (reference Coordinator::Sync named barriers)."""
    import jax
    import jax.numpy as jnp

    # a tiny psum across all devices acts as a barrier
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()
