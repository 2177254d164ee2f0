"""PC2 train / sample / vis entry point.

Rebuild of `experiments/main.py` with the same job names and dotted-override
CLI:

    python -m bdm_tpu.main run.job=train dataset=shapenet_r2n2 \
        dataset.root=... dataset.r2n2_dir=... dataset.category=chair \
        dataset.max_points=4096 dataset.subset_ratio=0.1 \
        dataloader.batch_size=16 run.max_steps=10000

    python -m bdm_tpu.main run.job=sample checkpoint.resume=<orbax dir> ...
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from bdm_tpu.cli import (
    apply_run_device,
    build_pc2,
    sample_output_dirs,
    save_batch_outputs,
    set_seed,
    setup_compile_cache,
)
from bdm_tpu.config import ProjectConfig, parse_cli
from bdm_tpu.config.structured import to_dict
from bdm_tpu.data import get_dataset
from bdm_tpu.parallel import get_mesh_for_batch
from bdm_tpu.train import (
    MetricLogger,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    restore_checkpoint,
    train_loop,
)
from bdm_tpu.train.checkpoint import save_checkpoint
from bdm_tpu.train.optimizers import pc2_freeze_mask


def train(cfg: ProjectConfig) -> None:
    pc2, params = build_pc2(cfg, cfg.checkpoint.resume if not
                            cfg.checkpoint.resume_training else None)
    loader_train, loader_val, _ = get_dataset(cfg)
    # `lr = batch_size * base_lr` when scale_learning_rate_with_batch_size
    # (reference `training_utils.py:34-37`; the num_processes factor is 1
    # here — the dataloader batch is already the GLOBAL batch, sharded
    # over the mesh rather than replicated per process)
    lr = cfg.optimizer.lr
    if cfg.optimizer.scale_learning_rate_with_batch_size:
        lr = cfg.dataloader.batch_size * lr
        print(f"lr = {cfg.dataloader.batch_size} (batch_size) * "
              f"{cfg.optimizer.lr} (base lr) = {lr}")
    if cfg.checkpoint.resume_training and (
            cfg.checkpoint.resume_training_scheduler
            != cfg.checkpoint.resume_training_optimizer):
        # optax fuses the lr schedule into the optimizer state (the
        # schedule count lives in opt_state), so the reference's split
        # restore (`training_utils.py:317-330`) cannot be expressed
        raise ValueError(
            "resume_training_scheduler must equal "
            "resume_training_optimizer on this backend: the lr-schedule "
            "step is part of the optimizer state")
    schedule = make_lr_schedule(
        cfg.scheduler.name, lr=lr,
        num_warmup_steps=cfg.scheduler.num_warmup_steps,
        num_training_steps=int(cfg.scheduler.num_training_steps))
    tx = make_optimizer(
        cfg.optimizer.name, lr=lr,
        weight_decay=cfg.optimizer.weight_decay,
        betas=tuple(cfg.optimizer.kwargs.get("betas", (0.95, 0.999))),
        clip_grad_norm=cfg.optimizer.clip_grad_norm, schedule=schedule,
        gradient_accumulation_steps=cfg.optimizer
        .gradient_accumulation_steps,
        freeze_mask=pc2_freeze_mask(params, cfg.run.freeze_feature_model))
    state = create_train_state(params, tx, use_ema=cfg.ema.use_ema,
                               ema_decay=cfg.ema.decay,
                               ema_update_every=cfg.ema.update_every)
    if cfg.checkpoint.resume and cfg.checkpoint.resume_training:
        state = restore_checkpoint(
            cfg.checkpoint.resume, state,
            restore_optimizer=cfg.checkpoint.resume_training_optimizer,
            restore_step=cfg.checkpoint.resume_training_state)

    mesh = get_mesh_for_batch(cfg.dataloader.batch_size)
    ckpt_dir = f"{cfg.run.save_dir}/{cfg.run.name}"
    logger = MetricLogger(jsonl_path=f"{ckpt_dir}/train_log.jsonl")
    import os
    os.makedirs(ckpt_dir, exist_ok=True)

    from bdm_tpu.utils.vis import WandbLogger
    wandb_logger = WandbLogger(cfg.logging.wandb, cfg.logging.wandb_project,
                               cfg.run.name, config=to_dict(cfg))

    def wandb_cb(step, state, metrics):
        if step % cfg.run.log_step_freq == 0:
            wandb_logger.log({k: float(v) for k, v in metrics.items()},
                             step=step)

    callbacks = [wandb_cb]
    if cfg.run.val_freq and cfg.run.val_freq > 0:
        callbacks.append(make_val_callback(
            cfg, pc2, loader_val, mesh, logger, wandb_logger))
    if cfg.run.vis_freq and cfg.run.vis_freq > 0:
        callbacks.append(make_vis_callback(cfg, pc2, loader_val, ckpt_dir,
                                           wandb_logger=wandb_logger))
    if cfg.run.vis_before_training:
        # render once before the loop (reference `main.py:132`)
        make_vis_callback(cfg, pc2, loader_val, ckpt_dir, force=True)(
            0, state, {})

    train_iter = loader_train.infinite()
    if cfg.run.limit_train_batches is not None:
        # cap the epoch at N batches (reference `main.py:199-201`): cycle
        # the first N batches forever
        import itertools
        head = list(itertools.islice(iter(loader_train),
                                     int(cfg.run.limit_train_batches)))

        def _cycle(bs):
            while True:
                yield from bs
        train_iter = _cycle(head)

    state = train_loop(
        state, pc2.loss, tx, train_iter,
        max_steps=cfg.run.max_steps, key=jax.random.PRNGKey(cfg.run.seed),
        mesh=mesh, checkpoint_dir=ckpt_dir,
        checkpoint_freq=cfg.run.checkpoint_freq,
        print_freq=cfg.run.print_step_freq,
        log_step_freq=cfg.run.log_step_freq, logger=logger,
        lr_schedule=schedule, callbacks=callbacks)
    wandb_logger.finish()
    save_checkpoint(ckpt_dir, state, config=to_dict(cfg))
    print(f"Training done at step {int(state.step)}; checkpoints in "
          f"{ckpt_dir}")


def make_val_callback(cfg: ProjectConfig, pc2, loader_val, mesh, logger,
                      wandb_logger):
    """Every `run.val_freq` steps compute the eps-MSE loss on held-out
    batches (fixed PRNG key, so the metric is comparable across evals) and
    log it — the reference's in-loop validation (`main.py:286-303`,
    `run.val_freq` / `run.limit_val_batches`)."""
    from bdm_tpu.data.loader import model_batch
    from bdm_tpu.parallel import shard_batch

    # limit_val_batches unset -> validate the FULL held-out loader, like
    # the reference's val loop (`main.py:286-303` iterates dataloader_val)
    limit = cfg.run.limit_val_batches
    val_batches = []
    for bi, batch in enumerate(loader_val):
        if limit is not None and bi >= limit:
            break
        b = model_batch(batch)
        if mesh is not None:
            b = shard_batch(b, mesh)
        val_batches.append(b)
    print(f"val callback: {len(val_batches)} batch(es) per eval")
    val_loss_fn = jax.jit(pc2.loss)

    def val_cb(step, state, metrics):
        if step % cfg.run.val_freq != 0 or not val_batches:
            return
        params = state.ema_params if state.ema_params is not None \
            else state.params
        losses = [float(val_loss_fn(params, b, jax.random.PRNGKey(0)))
                  for b in val_batches]
        val_loss = float(np.mean(losses))
        logger.update(val_loss=val_loss)
        logger.log_jsonl(step, val_loss=val_loss)
        wandb_logger.log({"val_loss": val_loss}, step=step)
        print(f"val @ step {step}: loss {val_loss:.4f}")

    return val_cb


def make_vis_callback(cfg: ProjectConfig, pc2, loader_val, ckpt_dir,
                      force: bool = False, wandb_logger=None):
    """Every `run.vis_freq` steps sample ONE held-out batch with the
    current (EMA) weights and save scatter renders under the run dir —
    the reference's in-loop `visualize` (`main.py:277-285`, and
    `run.vis_before_training` for the pre-loop call at `main.py:132`)."""
    from bdm_tpu.data.loader import model_batch
    batch = None

    def vis_cb(step, state, metrics):
        nonlocal batch
        if not force and (cfg.run.vis_freq <= 0
                          or step % cfg.run.vis_freq != 0 or step == 0):
            return
        if batch is None:
            batch = model_batch(next(iter(loader_val)))
        params = state.ema_params if state.ema_params is not None \
            else state.params
        pred = pc2.sample(
            params, batch, jax.random.PRNGKey(0),
            num_points=cfg.dataset.max_points,
            scheduler=cfg.run.diffusion_scheduler,
            num_inference_steps=cfg.run.num_inference_steps)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        out = os.path.join(ckpt_dir, f"vis_step{int(step):08d}.png")
        pts = np.asarray(pred[0])
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 2], pts[:, 1], s=0.5)
        ax.set_axis_off()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        if wandb_logger is not None:
            # interactive 3D panels, like the reference's wandb.Object3D
            # artifacts (`main.py:387-448`)
            wandb_logger.log_point_clouds(
                {"vis/pred": pts, "vis/gt": np.asarray(batch["points"][0])},
                step=step)
        print(f"vis @ step {step}: {out}")

    return vis_cb


def sample(cfg: ProjectConfig) -> None:
    pc2, params = build_pc2(cfg, cfg.checkpoint.resume,
                            from_ema=cfg.run.sample_from_ema)
    _, loader_val, _ = get_dataset(cfg)
    pred_dir, gt_dir = sample_output_dirs(cfg, "sample")

    evo_every = 100 if cfg.run.sample_save_evolutions else -1

    # no outer jit: the reverse loop is already one jitted scan internally
    def run(params, batch, key):
        return pc2.sample(params, batch, key,
                          num_points=cfg.dataset.max_points,
                          scheduler=cfg.run.diffusion_scheduler,
                          num_inference_steps=cfg.run.num_inference_steps,
                          return_sample_every_n_steps=evo_every)

    key = jax.random.PRNGKey(cfg.run.manual_seed or cfg.run.seed)
    for bi, batch in enumerate(loader_val):
        if (cfg.run.num_sample_batches is not None
                and bi >= cfg.run.num_sample_batches):
            break
        key, sub = jax.random.split(key)
        from bdm_tpu.data.loader import model_batch as _mb
        model_batch = _mb(batch)
        out = run(params, model_batch, sub)
        if evo_every > 0:
            pred, evolutions = out
            from bdm_tpu.utils.vis import render_evolution
            import os
            names = batch.get("sequence_name")
            for i in range(min(2, pred.shape[0])):  # a couple per batch
                name = names[i] if names else f"sample_{bi}_{i}"
                render_evolution(
                    np.asarray(evolutions[i]),
                    os.path.join(pred_dir, f"{name}_evolution.png"))
        else:
            pred = out
        save_batch_outputs(pred_dir, gt_dir, batch, pred)
        print(f"sampled batch {bi}: {pred.shape[0]} clouds -> {pred_dir}")
    print(f"Samples in {pred_dir}; ground truth in {gt_dir}")


def vis(cfg: ProjectConfig) -> None:
    """Save a handful of predictions as .ply plus matplotlib scatter PNGs
    (replaces the reference's pytorch3d/W&B renders, `main.py:306-451`)."""
    cfg.run.num_sample_batches = 1
    sample(cfg)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import glob
    import os
    from bdm_tpu.utils import read_ply
    pred_dir, _ = sample_output_dirs(cfg, "sample")
    for path in sorted(glob.glob(os.path.join(pred_dir, "*.ply")))[:4]:
        pts = read_ply(path)
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 2], pts[:, 1], s=0.5)
        ax.set_axis_off()
        fig.savefig(path.replace(".ply", ".png"), dpi=120)
        plt.close(fig)
    print(f"Visualizations next to the .ply files in {pred_dir}")


def main(argv=None) -> None:
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    apply_run_device(cfg)
    setup_compile_cache()
    set_seed(cfg.run.seed)
    if cfg.run.job == "train":
        train(cfg)
    elif cfg.run.job == "sample":
        sample(cfg)
    elif cfg.run.job == "vis":
        vis(cfg)
    else:
        raise ValueError(f"Invalid job: {cfg.run.job}")


if __name__ == "__main__":
    main()
