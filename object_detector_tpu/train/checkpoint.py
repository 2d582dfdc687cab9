"""Checkpoint/resume via orbax (SURVEY.md §5 checkpoint subsystem).

Saves the complete training tuple — params, batch_stats, optimizer state,
EMA, step, PRNG key, dataset cursor — with keep-last-k retention and async
writes; `restore` reconstructs the exact TrainState so resumed runs are
step-for-step continuations.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from object_detector_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, save_every: int = 1000):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_every,
                enable_async_checkpointing=True,
            ),
        )

    def save(
        self,
        state: TrainState,
        rng_key: jax.Array,
        data_step: int,
        step: Optional[int] = None,
        force: bool = False,
    ) -> bool:
        """Save if the retention policy wants this step.

        Pass `step` from the host-side loop counter: fetching the whole
        state (or even state.step) from device BEFORE the interval check
        costs a full tunnel round trip per training step.
        """
        if step is None:
            step = int(jax.device_get(state.step))
        if self._mgr.latest_step() == step:
            return False  # already on disk (e.g. final force-save after an
            # interval save at the same step)
        if not force and not self._mgr.should_save(step):
            return False
        payload = {
            "state": jax.device_get(state),
            "rng_key": jax.device_get(jax.random.key_data(rng_key)),
            "data_step": np.asarray(data_step),
        }
        return self._mgr.save(step, args=ocp.args.StandardSave(payload), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template_state: TrainState, template_rng: jax.Array
    ) -> Optional[Tuple[TrainState, jax.Array, int]]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "state": jax.device_get(template_state),
            "rng_key": jax.device_get(jax.random.key_data(template_rng)),
            "data_step": np.asarray(0),
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        state = restored["state"]
        rng = jax.random.wrap_key_data(restored["rng_key"])
        return state, rng, int(restored["data_step"])

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
