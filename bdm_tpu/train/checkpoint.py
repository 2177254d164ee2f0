"""Orbax checkpointing (replaces torch.save/load, `main.py:259-274`,
`training_utils.py:273-346`). Saves {params, ema_params, opt_state, step}
plus a JSON config sidecar; restore tolerates missing optimizer state
(`resume_training_optimizer`-style partial resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from bdm_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    config: Optional[dict] = None,
                    name: str = "checkpoint-latest") -> str:
    """Save a checkpoint; returns its path."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, state: TrainState,
                       restore_optimizer: bool = True,
                       restore_step: bool = True) -> TrainState:
    """Restore into an existing state (shapes/dtypes from `state`)."""
    path = os.path.abspath(path)
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    new = state.replace(params=restored["params"])
    if state.ema_params is not None and "ema_params" in restored:
        new = new.replace(ema_params=restored["ema_params"])
    if restore_optimizer:
        new = new.replace(opt_state=restored["opt_state"])
    if restore_step:
        new = new.replace(step=jax.numpy.asarray(restored["step"]))
    return new


def save_params(path: str, params: Any) -> str:
    """Save a bare param tree (for released-checkpoint style artifacts)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    return path


def load_params(path: str, template: Any = None) -> Any:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            return ckptr.restore(path, item=template)
        except ValueError:
            # checkpoints written on another topology pin device
            # shardings (the `_sharding` sidecar); a template-free
            # restore then fails with "sharding ... should be specified".
            # Restore as host numpy arrays instead — consumers re-place
            # the tree on whatever devices they use (e.g. a TPU-trained
            # checkpoint restored for CPU sampling or conversion).
            meta = ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", meta)
            tree = getattr(tree, "tree", tree)
            item = jax.tree.map(
                lambda m: np.zeros(m.shape, m.dtype), tree)
            restore_args = ocp.checkpoint_utils.construct_restore_args(
                item)
            return ckptr.restore(path, item=item,
                                 restore_args=restore_args)
