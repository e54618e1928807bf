"""Orbax checkpointing of the full train state + auto-resume.

Capability parity target: the reference's `tf.train.Saver` checkpoints +
`--restore_model_path` (SURVEY.md §5.4), upgraded per the survey plan to
periodic orbax checkpoints with resume-from-latest (§5.3: the reference's
only failure story was "crash = rerun").
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from transferable3d_tpu.train.train_loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, template: TrainState
                       ) -> Optional[TrainState]:
        """Restore the newest checkpoint into the template's structure."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
