"""Checkpoint/resume via orbax.

Parity: the reference delegates training checkpointing to TF's
MonitoredTrainingSession (reference: examples/tf/trainer.py:76-90,
checkpoint_dir + save_checkpoint_secs/steps); the graph store reloads from
source on restart.  Here: orbax saves the train state (params/opt_state/
step) — the store is likewise rebuilt from source (deterministic ingest).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


class Checkpointer:
    """save/restore {params, opt_state, step, extra} pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: Any, force: bool = False):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
