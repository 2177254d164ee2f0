"""Optimizer and LR-schedule factories.

Reference: `training_utils.py:30-92` + config defaults
(`config/structured.py:222-263`): AdamW(lr=1e-3, betas=(0.95, 0.999),
weight_decay=1e-6), biases/norm weights excluded from decay, global grad
clip 50.0, transformers 'linear'/'cosine' schedules with warmup.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import optax


def make_lr_schedule(name: str = "cosine", lr: float = 1e-3,
                     num_warmup_steps: int = 2000,
                     num_training_steps: int = 100_000) -> Callable:
    """transformers.get_scheduler semantics: linear warmup from 0, then
    'linear' decays linearly to 0 at num_training_steps; 'cosine' follows
    half a cosine to 0. 'constant' holds lr."""

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        if num_warmup_steps > 0:
            warm = jnp.minimum(1.0, step / num_warmup_steps)
        else:
            warm = 1.0
        progress = jnp.clip(
            (step - num_warmup_steps)
            / jnp.maximum(1.0, num_training_steps - num_warmup_steps),
            0.0, 1.0)
        if name == "linear":
            decay = 1.0 - progress
        elif name == "cosine":
            decay = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        elif name == "constant":
            decay = 1.0
        else:
            raise ValueError(f"Unknown schedule: {name}")
        return lr * warm * decay

    return schedule


def _no_decay_mask(params):
    """True where weight decay applies. Excludes biases and norm scales
    (the reference excludes 'bias' and 'LayerNorm.weight',
    `training_utils.py:43`; we also exclude GroupNorm scales — with
    wd=1e-6 this is inconsequential but standard)."""

    def decide(path, _):
        names = {getattr(k, "key", getattr(k, "name", "")) for k in path}
        if "bias" in names:
            return False
        if "scale" in names:  # flax GroupNorm/LayerNorm weight
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(name: str = "AdamW", lr: float = 1e-3,
                   weight_decay: float = 1e-6,
                   betas: tuple = (0.95, 0.999),
                   clip_grad_norm: Optional[float] = 50.0,
                   schedule: Optional[Callable] = None,
                   gradient_accumulation_steps: int = 1,
                   freeze_mask=None) -> optax.GradientTransformation:
    """Build the optax chain: clip -> AdamW(no-decay groups) -> schedule
    [-> freeze mask] [-> grad accumulation]."""
    lr_or_schedule = schedule if schedule is not None else lr

    if name == "AdamW":
        core = optax.adamw(
            learning_rate=lr_or_schedule, b1=betas[0], b2=betas[1],
            weight_decay=weight_decay, mask=_no_decay_mask)
    elif name == "Adam":
        core = optax.adam(learning_rate=lr_or_schedule, b1=betas[0],
                          b2=betas[1])
    elif name == "Adadelta":
        core = optax.adadelta(learning_rate=lr_or_schedule)
    elif name == "SGD":
        core = optax.sgd(learning_rate=lr_or_schedule)
    else:
        raise NotImplementedError(f"Unknown optimizer: {name}")

    parts = []
    if clip_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    parts.append(core)
    tx = optax.chain(*parts)

    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, freeze_mask)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, gradient_accumulation_steps)
    return tx


FUSION_FROZEN_SUBTREES = ("pc2_encoder", "pvd_encoder")


def fusion_freeze_mask(params):
    """Label tree for BDM-Merging training: freeze both encoder towers and
    the feature model; train decoder/embedf/projs
    (`model/__init__.py:27-35`). Works on the merging param dict
    {'feature_model': ..., 'fusion_model': ...}."""

    def decide(path, _):
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if keys and keys[0] == "feature_model":
            return "freeze"
        if any(k in FUSION_FROZEN_SUBTREES for k in keys):
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(decide, params)


def pc2_freeze_mask(params, freeze_feature_model: bool = True):
    """PC2 training freezes the ViT (`run.freeze_feature_model` default
    True, `model/__init__.py:9-10`)."""

    def decide(path, _):
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if freeze_feature_model and keys and keys[0] == "feature_model":
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(decide, params)
