"""Checkpoint management on orbax.

Parity targets:
* automatic periodic checkpoints with retention
  (reference: train.py:69-73 RunConfig(save_checkpoints_steps,
  keep_checkpoint_max))
* warm start from an arbitrary checkpoint with regex-filtered variable
  restore (reference: train.py:75-77 WarmStartSettings, hparams
  ``ckpt_to_initialize_from`` / ``vars_to_warm_start`` hparams.py:187-190)
* restore-specific-checkpoint for prediction (reference: predict_mel.py:54)
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_interval_steps: int = 1,
                 max_to_keep: Optional[int] = None, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if force and step in self._mgr.all_steps():
            return False  # final save landing exactly on a periodic save
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state),
                               force=force)
        return saved

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> Sequence[int]:
        return self._mgr.all_steps()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def warm_start(params: Any, ckpt_dir: str, vars_to_warm_start: Sequence[str],
               step: Optional[int] = None) -> Any:
    """Restore only parameters whose '/'-joined path matches any of the
    regexes; everything else keeps its fresh initialization
    (reference: train.py:75-77)."""
    mgr = CheckpointManager(ckpt_dir)
    restore_step = step if step is not None else mgr.latest_step()
    if restore_step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    # restore the full state dict, then filter params
    restored = mgr.restore(None, step=restore_step)
    mgr.close()
    restored_params = _find_params_tree(restored)
    patterns = [re.compile(p) for p in vars_to_warm_start]

    flat_new = _flatten_with_paths(params)
    flat_old = _flatten_with_paths(restored_params)
    merged = {}
    for path, value in flat_new.items():
        if path in flat_old and any(p.search(path) for p in patterns):
            old = np.asarray(flat_old[path])
            if old.shape == np.asarray(value).shape:
                merged[path] = old
                continue
        merged[path] = value
    return _unflatten_like(params, merged)


def _find_params_tree(restored: Any) -> Any:
    """Accept either a TrainState-like mapping or a bare params tree."""
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    if hasattr(restored, "params"):
        return restored.params
    if isinstance(restored, (list, tuple)) and len(restored) >= 2:
        # TrainState tuple: (step, params, batch_stats, constants, opt_state)
        return restored[1]
    return restored


def _flatten_with_paths(tree: Any) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        out[name] = leaf
    return out


def _unflatten_like(template: Any, flat: dict) -> Any:
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        leaves.append(flat.get(name, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)
