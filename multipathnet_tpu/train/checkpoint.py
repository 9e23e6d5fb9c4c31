"""Checkpoint/resume via orbax (SURVEY.md §5 "Checkpoint / resume").

The reference torch.save'd the whole model per epoch with weak manual resume.
Here: params + optimizer state + step + PRNG key are saved atomically every
cfg.train.checkpoint_every steps; `restore_latest` resumes exactly
(typed PRNG keys are stored as raw key data — orbax can't serialize them).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from multipathnet_tpu.train.loop import TrainState


def _to_saveable(state: TrainState):
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "key_data": jax.random.key_data(state.key),
    }


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, force: bool = False) -> None:
        step = int(np.asarray(state.step))
        if step in self._mgr.all_steps():
            return  # idempotent: periodic + final save can hit the same step
        self._mgr.save(step, args=ocp.args.StandardSave(_to_saveable(state)),
                       force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = _to_saveable(template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        return TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            key=jax.random.wrap_key_data(restored["key_data"]),
        )
