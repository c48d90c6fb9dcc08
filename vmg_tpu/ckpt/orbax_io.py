"""Orbax checkpointing: model params + optimizer state + step
(TPU-native replacement for the reference's .pth/.state pairs,
``tools/Trainer.py:281-372``)."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _mngr(directory: str, max_to_keep: int = 10) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    max_to_keep: int = 10) -> None:
    """Save a flax TrainState (or any pytree) at ``directory/step``."""
    mngr = _mngr(directory, max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mngr = _mngr(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_checkpoint(directory: str, state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``state`` (abstract or concrete)."""
    mngr = _mngr(directory)
    if step is None:
        step = mngr.latest_step()
    restored = mngr.restore(step, args=ocp.args.StandardRestore(state))
    mngr.close()
    return restored
