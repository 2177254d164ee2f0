"""BDM-Merging entry point (jobs: training_bdm_merging, sample_bdm_merging).

Rebuild of `experiments/main_merging.py`:

    python -m bdm_tpu.main_merging run.job=training_bdm_merging \
        scheduler=fusion run.max_fusion_steps=20000 \
        aux_run.prior_ckpt=<pvd> aux_run.recon_ckpt=<pc2> ...

    python -m bdm_tpu.main_merging run.job=sample_bdm_merging \
        aux_run.prior_ckpt=<pvd> aux_run.recon_ckpt=<pc2> \
        aux_run.fusion_ckpt=<fusion> ...
"""

from __future__ import annotations

import os
import sys

import jax

from bdm_tpu.cli import (
    apply_run_device,
    build_fusion,
    build_pc2,
    build_pvd,
    resolve_milestones,
    sample_output_dirs,
    save_batch_outputs,
    set_seed,
    setup_compile_cache,
)
from bdm_tpu.config import ProjectConfig, parse_cli
from bdm_tpu.config.structured import to_dict
from bdm_tpu.data import get_dataset
from bdm_tpu.parallel import get_mesh_for_batch
from bdm_tpu.samplers import bdm_merging
from bdm_tpu.train import (
    MetricLogger,
    create_train_state,
    fusion_freeze_mask,
    make_lr_schedule,
    make_optimizer,
    train_loop,
)
from bdm_tpu.train.checkpoint import save_checkpoint


def _build_all(cfg: ProjectConfig, with_fusion_ckpt: bool):
    pc2, pc2_params = build_pc2(cfg, cfg.aux_run.recon_ckpt)
    pvd, pvd_params = build_pvd(cfg, cfg.aux_run.prior_ckpt)
    merge, merge_params = build_fusion(
        cfg, pc2, pc2_params, pvd_params,
        cfg.aux_run.fusion_ckpt if with_fusion_ckpt else None)
    return pc2, pc2_params, pvd, pvd_params, merge, merge_params


def training_bdm_merging(cfg: ProjectConfig) -> None:
    """Finetune the fusion decoder (`main_merging.py:242-366`): towers
    frozen, scheduler=fusion (cosine, 200 warmup, max_fusion_steps)."""
    _, _, _, _, merge, params = _build_all(cfg, with_fusion_ckpt=False)
    loader_train, _, _ = get_dataset(cfg)

    steps = cfg.run.max_fusion_steps
    schedule = make_lr_schedule(
        cfg.scheduler.name, lr=cfg.optimizer.lr,
        num_warmup_steps=cfg.scheduler.num_warmup_steps,
        num_training_steps=int(cfg.scheduler.num_training_steps))
    tx = make_optimizer(
        cfg.optimizer.name, lr=cfg.optimizer.lr,
        weight_decay=cfg.optimizer.weight_decay,
        betas=tuple(cfg.optimizer.kwargs.get("betas", (0.95, 0.999))),
        clip_grad_norm=cfg.optimizer.clip_grad_norm, schedule=schedule,
        gradient_accumulation_steps=cfg.optimizer
        .gradient_accumulation_steps,
        freeze_mask=fusion_freeze_mask(params))
    state = create_train_state(params, tx, use_ema=cfg.ema.use_ema,
                               ema_decay=cfg.ema.decay,
                               ema_update_every=cfg.ema.update_every)

    mesh = get_mesh_for_batch(cfg.dataloader.batch_size)
    ckpt_dir = f"{cfg.run.save_dir}/{cfg.run.name}"
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = MetricLogger(jsonl_path=f"{ckpt_dir}/train_log.jsonl")
    state = train_loop(
        state, merge.loss, tx, loader_train.infinite(), max_steps=steps,
        key=jax.random.PRNGKey(cfg.run.seed), mesh=mesh,
        checkpoint_dir=ckpt_dir, checkpoint_freq=cfg.run.checkpoint_freq,
        print_freq=cfg.run.print_step_freq,
        log_step_freq=cfg.run.log_step_freq, logger=logger,
        lr_schedule=schedule)
    save_checkpoint(ckpt_dir, state, config=to_dict(cfg))
    print(f"Fusion training done at step {int(state.step)}; checkpoints in "
          f"{ckpt_dir}")


def sample_bdm_merging(cfg: ProjectConfig) -> None:
    pc2, pc2_params, pvd, pvd_params, merge, merge_params = _build_all(
        cfg, with_fusion_ckpt=True)
    _, loader_val, _ = get_dataset(cfg)
    milestones = resolve_milestones(cfg)
    pred_dir, gt_dir = sample_output_dirs(cfg, "sample_bdm_merging")

    # no outer jit: milestone windows are jitted scans cached by length
    def run(merge_params, pc2_params, pvd_params, batch, key):
        return bdm_merging(
            merge, merge_params, pc2, pc2_params, pvd, pvd_params, batch,
            key, num_points=cfg.dataset.max_points, milestones=milestones,
            roll_step=cfg.aux_run.roll_step,
            scheduler=cfg.run.diffusion_scheduler,
            num_inference_steps=cfg.run.num_inference_steps)

    key = jax.random.PRNGKey(cfg.run.manual_seed or cfg.run.seed)
    from bdm_tpu.data.loader import model_batch as _mb
    for bi, batch in enumerate(loader_val):
        if (cfg.run.num_sample_batches is not None
                and bi >= cfg.run.num_sample_batches):
            break
        key, sub = jax.random.split(key)
        pred = run(merge_params, pc2_params, pvd_params, _mb(batch), sub)
        save_batch_outputs(pred_dir, gt_dir, batch, pred)
        print(f"merged batch {bi}: {pred.shape[0]} clouds -> {pred_dir}")
    print(f"Samples in {pred_dir}; ground truth in {gt_dir}")


def main(argv=None) -> None:
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    apply_run_device(cfg)
    setup_compile_cache()
    set_seed(cfg.run.seed)
    if cfg.run.job == "training_bdm_merging":
        training_bdm_merging(cfg)
    elif cfg.run.job == "sample_bdm_merging":
        sample_bdm_merging(cfg)
    else:
        raise ValueError(f"Invalid job: {cfg.run.job}")


if __name__ == "__main__":
    main()
