"""Training-state checkpoint/resume (orbax).

The reference only ever *loads* pretrained weights (SURVEY.md §5: four load
flavors, no runtime state checkpointing); a production training framework
needs save/restore of the full train state, so this provides it on orbax with
step-numbered directories and latest-resume.
"""
from __future__ import annotations

import os
import re

import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state, step: int | None = None) -> str:
    step = int(step if step is not None else np.asarray(state.step))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _ckptr().save(path, state, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    # exact-name match only: an interrupted orbax save leaves an UNCOMMITTED
    # `step_XXXXXXXX.orbax-checkpoint-tmp-<ts>` dir that both startswith
    # "step_" and sorts after the committed dir of the same step — restoring
    # it would crash or load partial state, so it must never be selected
    steps = sorted(d for d in os.listdir(ckpt_dir)
                   if re.fullmatch(r"step_\d{8}", d))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_checkpoint(ckpt_dir: str, target):
    """Restore the latest checkpoint into the structure of ``target``
    (a template TrainState); returns None when no checkpoint exists."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    return _ckptr().restore(path, item=target)
