"""Orbax checkpointing: params + batch_stats + optimizer state + step.

Replaces the reference's raw ``torch.save(state_dict)`` files
(``ocr/train/crnn.py:300-302,323-324``), which dropped optimizer state
and whose resume path referenced config keys that don't exist
(``crnn.py:104-109``).  Layout: ``<dir>/<step>/...`` managed by orbax;
``best`` is tracked in a small JSON sidecar.
"""
from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    metrics: dict | None = None,
                    max_to_keep: int = 5) -> None:
    # Same-step re-save must REPLACE: orbax otherwise refuses a step
    # that already exists (silently skipped, or StepAlreadyExistsError
    # under force=True) — a retrain ending at the same final step
    # would keep the stale weights on disk (observed: two demo-CRAFT
    # retrains both ending at step 3000, the second's state lost).
    #
    # Replace SAFELY: the old step is renamed aside (atomic) and only
    # removed after the new save is finalized — delete-then-save would
    # leave NO copy of the step if the process dies mid-save.
    import shutil

    root = os.path.abspath(directory)
    mgr = _manager(directory, max_to_keep)
    backup = None
    if step in mgr.all_steps():
        mgr.close()
        for name in os.listdir(root):
            try:
                is_step = int(name) == step
            except ValueError:
                continue
            if is_step:
                backup = os.path.join(root, f"replaced.{name}.bak")
                if os.path.exists(backup):
                    shutil.rmtree(backup)
                os.rename(os.path.join(root, name), backup)
                break
        mgr = _manager(directory, max_to_keep)  # re-scan sans the step
    try:
        mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics,
                 force=True)
        mgr.wait_until_finished()
    except BaseException:
        if backup is not None:  # put the old state back
            target = os.path.join(root, os.path.basename(backup)[9:-4])
            if not os.path.exists(target):
                os.rename(backup, target)
        raise
    finally:
        mgr.close()
    if backup is not None:
        shutil.rmtree(backup)


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template: Any,
                       step: int | None = None) -> tuple[Any, int]:
    """Restore into the structure/shardings of ``template``; returns
    (state, step)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return state, step


def load_variables_for_inference(directory: str, template_state: Any,
                                 step: int | None = None) -> dict:
    """Restore a TrainState checkpoint and repackage as the
    {'params', 'batch_stats'} variables dict the inference engines use."""
    state, _ = restore_checkpoint(directory, template_state, step)
    return {"params": state.params, "batch_stats": state.batch_stats}


def record_best(directory: str, step: int, metric: float) -> bool:
    """Track the best eval metric; returns True if this step is the new
    best (caller then saves/copies)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "best.json")
    best = None
    if os.path.isfile(path):
        with open(path) as f:
            best = json.load(f)
    if best is None or metric > best["metric"]:
        with open(path, "w") as f:
            json.dump({"step": step, "metric": metric}, f)
        return True
    return False
