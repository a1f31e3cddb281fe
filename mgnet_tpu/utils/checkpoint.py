"""Checkpointing via Orbax.

Replaces the reference's DetectionCheckpointer (reference:
tools/train_net.py:222-224; SURVEY.md §5 checkpoint/resume): periodic
step checkpoints carrying params + BN statistics + optimizer state, resume
from latest, and params-only restore for inference/eval
(--eval-only MODEL.WEIGHTS analog).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_params", "load_params"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing (abstract-compatible) TrainState."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, False
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ), True

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any, batch_stats: Any) -> None:
    """Standalone params+stats snapshot for inference/export."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {"params": params, "batch_stats": batch_stats},
    )
    ckptr.wait_until_finished()


def load_params(path: str, target: Optional[Any] = None):
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    return restored["params"], restored["batch_stats"]
