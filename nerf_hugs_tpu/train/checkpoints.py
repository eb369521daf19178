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
_COMPAT_FILE = "model_compat.json"


def _compat_fields(config) -> Optional[dict]:
    """Model-function choices a checkpoint silently depends on.

    `nerfacto.hash_impl` ('xor' vs 'add', configs/config.py) changes the
    hashed-level lookup indices but NOT the param tree, so a checkpoint
    restores cleanly across the switch and renders near-noise with no
    error. Returns None for model types with no such fields."""
    if getattr(config, "model_type", None) != "nerfacto":
        return None
    return {"hash_impl": getattr(config.nerfacto, "hash_impl", "xor")}


def record_model_compat(directory: str, config) -> None:
    """Write the compat sidecar next to the checkpoints (process 0, once;
    call check_model_compat first on resume paths)."""
    fields = _compat_fields(config)
    if fields is None or jax.process_index() != 0:
        return
    path = os.path.join(directory, _COMPAT_FILE)
    if os.path.exists(path):
        return
    import json
    os.makedirs(directory, exist_ok=True)
    with open(path, "w") as f:
        json.dump(fields, f)


def check_model_compat(directory: str, config) -> None:
    """Raise if `config` is model-function-incompatible with the
    checkpoints under `directory` (no-op when no sidecar exists — pre-guard
    runs and fresh directories)."""
    fields = _compat_fields(config)
    path = os.path.join(directory, _COMPAT_FILE)
    if fields is None or not os.path.exists(path):
        return
    import json
    with open(path) as f:
        saved = json.load(f)
    for key, want in fields.items():
        have = saved.get(key, "xor" if key == "hash_impl" else None)
        if have != want:
            raise ValueError(
                f"checkpoints under {directory} were trained with "
                f"{key}={have!r} but the config sets {key}={want!r} — the "
                f"param trees match so the restore would succeed and render "
                f"garbage. Use a config with {key}: {have} (checkpoints do "
                f"not transfer between hash_impl modes).")


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
