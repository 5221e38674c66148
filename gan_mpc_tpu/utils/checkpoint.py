"""Orbax checkpoint / resume for full training state.

The reference saves params only once at the very end of a run — a crash
loses everything (SURVEY.md §5: params written at ``norm/runner.py:269``;
an Orbax path exists but is commented out as deprecated,
``utils.py:309-337``). Here the FULL training state — params, every
optimizer state, the device-resident replay buffer, the PRNG key, and the
epoch counter — checkpoints periodically and training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class TrainCheckpointer:
    """Thin wrapper over an Orbax CheckpointManager for one run dir."""

    def __init__(self, directory: str, keep: int = 3, every: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._every = max(every, 1)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save if ``step`` hits the cadence. Returns True if saved."""
        if step % self._every != 0:
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shapes of ``template``."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir!r}")
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def clear(self):
        """Delete all saved steps (call when a run COMPLETES: the run's
        artifacts live under trained_models/, and a leftover final
        checkpoint would make the next fresh invocation silently resume
        — i.e. skip — a finished run)."""
        for step in list(self._mgr.all_steps()):
            self._mgr.delete(step)
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
