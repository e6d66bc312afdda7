"""Checkpoint save/resume via orbax.

Counterpart of the reference's torch.save checkpointing
(/root/reference/train_emernerf.py:862-877, utils/misc.py:50-95): the full
TrainState (model + proposal params, both optimizer states, step) is stored
as ``checkpoint_{step:05d}`` under the log dir; resume restores everything
and returns the start step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from emernerf_tpu.train.state import TrainState


def save_checkpoint(log_dir: str, state: TrainState, step: Optional[int] = None):
    step = int(state.step) if step is None else int(step)
    path = os.path.abspath(os.path.join(log_dir, f"checkpoint_{step:05d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, abstract_state: TrainState) -> TrainState:
    """Restore into the structure of ``abstract_state`` (an initialized
    TrainState providing shapes/dtypes)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state),
    )
    return restored


def latest_checkpoint(log_dir: str) -> Optional[str]:
    if not os.path.isdir(log_dir):
        return None
    ckpts = sorted(
        d for d in os.listdir(log_dir) if d.startswith("checkpoint_")
    )
    return os.path.join(log_dir, ckpts[-1]) if ckpts else None
