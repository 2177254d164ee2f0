"""Shared CLI orchestration: model building, checkpoint wiring, sampling
output layout. Used by main.py / main_blending.py / main_merging.py."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from bdm_tpu.samplers import BDMMergingModel, PC2Model, ProjectionConfig, \
    PVDModel
from bdm_tpu.train.checkpoint import load_params
from bdm_tpu.utils import write_ply


def setup_compile_cache() -> None:
    """Enable the persistent XLA compile cache for every CLI entry point
    (cold window-scan compiles cost ~10 min on the TPU toolchain; warm
    runs load in seconds). The threshold is 0 so the hundreds of tiny
    host-level executables (eager divides, broadcasts, ...) are cached
    too — at ~0.4 s each they dominated the bench warmup. Override the
    directory with BDM_COMPILE_CACHE_DIR; disable with =0. Concurrent
    processes are redirected to a private per-PID namespace (see
    utils/compile_cache.py)."""
    from bdm_tpu.utils.compile_cache import setup_compile_cache as _setup
    _setup(min_compile_secs=0.0)


def projection_config(cfg: ProjectConfig) -> ProjectionConfig:
    m = cfg.model
    return ProjectionConfig(
        image_size=int(m.image_size),
        image_feature_model=m.image_feature_model,
        use_local_colors=m.use_local_colors,
        use_local_features=m.use_local_features,
        use_global_features=m.use_global_features,
        use_mask=m.use_mask,
        use_distance_transform=m.use_distance_transform,
        predict_shape=m.predict_shape,
        predict_color=m.predict_color,
        colors_mean=m.colors_mean,
        colors_std=m.colors_std,
        color_channels=m.color_channels,
        scale_factor=float(m.scale_factor),
        raster_point_radius=m.raster_point_radius,
        raster_splat=m.raster_splat,
        beta_start=m.beta_start,
        beta_end=m.beta_end,
        beta_schedule=m.beta_schedule,
        point_cloud_model=m.point_cloud_model,
        point_cloud_model_embed_dim=m.point_cloud_model_embed_dim,
        mixed_precision=cfg.run.mixed_precision,
    )


def apply_run_device(cfg: ProjectConfig) -> None:
    """`run.cpu=True` forces the CPU backend (the reference's
    `Accelerator(cpu=cfg.run.cpu)`, `main.py:41`). Must run before the
    first backend touch (set_seed creates a PRNG key)."""
    if cfg.run.cpu:
        jax.config.update("jax_platforms", "cpu")


def build_pc2(cfg: ProjectConfig, ckpt: Optional[str] = None,
              from_ema: bool = False):
    """Build the PC2 model; load params from an orbax checkpoint if given,
    else randomly initialize. `from_ema` prefers the checkpoint's EMA
    parameters (`run.sample_from_ema`, reference `main.py:150`)."""
    pc2 = PC2Model(projection_config(cfg))
    params = pc2.init_params(jax.random.PRNGKey(cfg.run.seed),
                             num_points=min(1024, cfg.dataset.max_points))
    if ckpt:
        restored = load_params(_params_path(ckpt), template=None)
        params = _extract_params(restored, params, from_ema=from_ema)
    elif from_ema:
        raise ValueError("run.sample_from_ema needs checkpoint.resume")
    return pc2, params


def build_pvd(cfg: ProjectConfig, ckpt: Optional[str] = None):
    pvd = PVDModel(mixed_precision=cfg.run.mixed_precision)
    params = pvd.init_params(jax.random.PRNGKey(cfg.run.seed + 1),
                             num_points=min(1024, cfg.dataset.max_points))
    if ckpt:
        restored = load_params(_params_path(ckpt), template=None)
        params = _extract_params(restored, params)
    return pvd, params


def build_fusion(cfg: ProjectConfig, pc2, pc2_params, pvd_params,
                 ckpt: Optional[str] = None):
    merge = BDMMergingModel(projection_config(cfg), pc2=pc2)
    params = merge.init_from_pretrained(
        jax.random.PRNGKey(cfg.run.seed + 2), pc2_params, pvd_params,
        num_points=min(1024, cfg.dataset.max_points))
    if ckpt:
        restored = load_params(_params_path(ckpt), template=None)
        params = _extract_params(restored, params)
    return merge, params


def _params_path(ckpt: str) -> str:
    """Accept either a bare params dir or a train checkpoint dir."""
    return ckpt


def _merge_into(template, restored, path=""):
    """Recursively overlay `restored` on `template`, keeping template
    entries the checkpoint doesn't provide — the analogue of the
    reference's `load_state_dict(..., strict=False)` resume
    (`training_utils.py:273-346`). E.g. a converted PC2 checkpoint that
    carries only the point-cloud backbone keeps the initialized image
    feature model."""
    if not isinstance(restored, dict) or not isinstance(template, dict):
        return restored
    out = dict(template)
    for k, v in restored.items():
        out[k] = _merge_into(template.get(k), v, f"{path}/{k}")
    return out


def _extract_params(restored, template, from_ema: bool = False):
    """Train checkpoints store {'params': ...}; bare param saves store the
    tree directly. `from_ema` selects 'ema_params' and errors when the
    checkpoint has none (a silent fallback would sample the raw weights
    while claiming EMA)."""
    if isinstance(restored, dict) and "params" in restored and \
            set(restored.keys()) <= {"params", "ema_params", "opt_state",
                                     "step"}:
        if from_ema:
            if "ema_params" not in restored:
                raise ValueError(
                    "run.sample_from_ema=True but the checkpoint holds no "
                    "ema_params (trained with ema.use_ema=False?)")
            return _merge_into(template, restored["ema_params"])
        return _merge_into(template, restored["params"])
    if from_ema:
        raise ValueError(
            "run.sample_from_ema=True needs a train checkpoint with "
            "ema_params; got a bare parameter tree")
    return _merge_into(template, restored)


def resolve_milestones(cfg: ProjectConfig):
    ms = cfg.aux_run.milestones
    if ms is None:
        # the canonical BDM schedule (`example_sample_blending.sh`)
        ms = [1000, 968, 936, 872, 128, 64, 32, 0]
    return [int(m) for m in ms]


def sample_output_dirs(cfg: ProjectConfig, kind: str) -> tuple:
    base = os.path.join(cfg.run.save_dir, cfg.run.name, kind)
    pred = os.path.join(base, "pred", cfg.dataset.category)
    gt = os.path.join(base, "gt", cfg.dataset.category)
    os.makedirs(pred, exist_ok=True)
    os.makedirs(gt, exist_ok=True)
    return pred, gt


def save_batch_outputs(pred_dir: str, gt_dir: str, batch, pred) -> None:
    """Write pred/gt .ply pairs named by sequence_name (the reference's
    layout, matched by the evaluation CLIs)."""
    names = batch.get("sequence_name")
    pred = np.asarray(pred)
    gt = np.asarray(batch["points"])
    for i in range(pred.shape[0]):
        name = names[i] if names else f"sample_{i:05d}"
        write_ply(os.path.join(pred_dir, f"{name}.ply"), pred[i])
        write_ply(os.path.join(gt_dir, f"{name}.ply"), gt[i])


def set_seed(seed: int) -> None:
    import random
    random.seed(seed)
    np.random.seed(seed)
