"""Checkpoint save/restore via orbax, step-numbered layout.

Replaces flax.training.checkpoints (reference: MipNeRF360/train.py:121,
232-236) with orbax StandardCheckpointer under {dir}/checkpoint_{step}/ so
the eval loop can poll for new steps; finetune stages checkpoint into
{dir}/finetune (train.py:107). keep=N mirrors the reference's retention.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^checkpoint_(\d+)$")


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"checkpoint_{step}")


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := _STEP_RE.match(name))]
    return max(steps) if steps else None


def save_checkpoint(directory: str, state: Any, step: int,
                    keep: int = 100) -> None:
    """Save the (unreplicated) TrainState.

    EVERY process must call this: orbax's save performs global barriers
    internally (and writes from the primary process only) — gating the call
    on process_index deadlocks process 0 inside that barrier under
    jax.distributed (found by the 2-process eval test). Retention cleanup is
    filesystem-only and stays on process 0."""
    if jax.process_index() == 0:
        os.makedirs(directory, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        path = _ckpt_path(directory, step)
        ckptr.save(path, jax.device_get(state), force=True)
    if jax.process_index() != 0:
        return
    # Retention: drop oldest beyond `keep`.
    steps = sorted(int(m.group(1)) for name in os.listdir(directory)
                   if (m := _STEP_RE.match(name)))
    for old in steps[:-keep]:
        import shutil
        shutil.rmtree(_ckpt_path(directory, old), ignore_errors=True)


def restore_checkpoint(directory: str, state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of `state`; returns `state` if no ckpt."""
    if step is None:
        step = latest_step(directory)
    if step is None:
        return state
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_ckpt_path(directory, step),
                             jax.device_get(state))


def restore_params(directory: str, state: Any,
                   step: Optional[int] = None) -> Any:
    """Restore only params+step into `state` (eval path).

    Eval doesn't need optimizer state, and the finetune stage's opt_state has
    a different pytree (multi_transform) than the train stage's adam — a
    params-only partial restore works against either checkpoint
    (reference behavior: eval.py restores whatever checkpoint is newest).
    """
    if step is None:
        step = latest_step(directory)
    if step is None:
        return state
    skeleton = {"params": jax.device_get(state.params),
                "step": jax.device_get(state.step)}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            _ckpt_path(directory, step),
            args=ocp.args.PyTreeRestore(item=skeleton, partial_restore=True))
    return state.replace(params=restored["params"], step=restored["step"])
