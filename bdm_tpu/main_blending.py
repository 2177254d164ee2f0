"""BDM-Blending entry point (job: sample_bdm_blending).

Rebuild of `experiments/main_blending.py`:

    python -m bdm_tpu.main_blending run.job=sample_bdm_blending \
        dataset=shapenet_r2n2 dataset.max_points=4096 \
        aux_run.roll_step=16 aux_run.milestones=[1000,968,936,872,128,64,32,0] \
        aux_run.prior_ckpt=<pvd orbax dir> aux_run.recon_ckpt=<pc2 orbax dir>
"""

from __future__ import annotations

import sys

import jax

from bdm_tpu.cli import (
    apply_run_device,
    build_pc2,
    build_pvd,
    resolve_milestones,
    sample_output_dirs,
    save_batch_outputs,
    set_seed,
    setup_compile_cache,
)
from bdm_tpu.config import ProjectConfig, parse_cli
from bdm_tpu.data import get_dataset
from bdm_tpu.samplers import bdm_blending


def sample_bdm_blending(cfg: ProjectConfig) -> None:
    recon_ckpt = cfg.aux_run.recon_ckpt or cfg.checkpoint.resume
    # run.sample_from_ema selects the recon checkpoint's EMA weights
    # (reference main_blending.py:148-157)
    pc2, pc2_params = build_pc2(cfg, recon_ckpt,
                                from_ema=cfg.run.sample_from_ema)
    pvd, pvd_params = build_pvd(cfg, cfg.aux_run.prior_ckpt)
    _, loader_val, _ = get_dataset(cfg)
    milestones = resolve_milestones(cfg)
    pred_dir, gt_dir = sample_output_dirs(cfg, "sample_bdm_blending")

    # no outer jit: each milestone window is one jitted scan, cached by
    # window length (see samplers.pc2._jitted_window_scan)
    def run(pc2_params, pvd_params, batch, key):
        return bdm_blending(
            pc2, pc2_params, pvd, pvd_params, batch, key,
            num_points=cfg.dataset.max_points, milestones=milestones,
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
        pred = run(pc2_params, pvd_params, _mb(batch), sub)
        save_batch_outputs(pred_dir, gt_dir, batch, pred)
        print(f"blended batch {bi}: {pred.shape[0]} clouds -> {pred_dir}")
    print(f"Samples in {pred_dir}; ground truth in {gt_dir}")


def main(argv=None) -> None:
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    apply_run_device(cfg)
    setup_compile_cache()
    set_seed(cfg.run.seed)
    if cfg.run.job == "sample_bdm_blending":
        sample_bdm_blending(cfg)
    else:
        raise ValueError(f"Invalid job: {cfg.run.job}")


if __name__ == "__main__":
    main()
