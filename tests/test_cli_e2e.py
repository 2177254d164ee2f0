"""End-to-end CLI smoke tests: train a few steps and sample through the
real entry points, with the production-size backbone swapped for the tiny
test specs."""

import glob
import os

import numpy as np
import pytest

import bdm_tpu.cli as cli
from bdm_tpu.samplers import PC2Model
from tests.test_models import TINY_FP, TINY_SA


@pytest.fixture
def tiny_build(monkeypatch):
    """Make bdm_tpu.cli build tiny models regardless of config."""
    import jax

    def build_pc2(cfg, ckpt=None, from_ema=False):
        pc2 = PC2Model(cli.projection_config(cfg), sa_blocks=TINY_SA,
                       fp_blocks=TINY_FP)
        params = pc2.init_params(jax.random.PRNGKey(0),
                                 num_points=cfg.dataset.max_points)
        if ckpt:
            from bdm_tpu.train.checkpoint import load_params
            restored = load_params(ckpt, template=None)
            params = cli._extract_params(restored, params)
        return pc2, params

    monkeypatch.setattr(cli, "build_pc2", build_pc2)
    import bdm_tpu.main as main_mod
    monkeypatch.setattr(main_mod, "build_pc2", build_pc2)
    return build_pc2


BASE_ARGS = [
    "dataset=synthetic", "dataset.image_size=16", "dataset.max_points=32",
    "model.image_feature_model=identity",
    "model.point_cloud_model_embed_dim=8",
    "dataloader.batch_size=2", "dataloader.num_workers=0",
    "run.num_inference_steps=4", "logging.wandb=false",
]


def test_cli_train_bf16(tmp_path, tiny_build):
    """Training under run.mixed_precision=bf16 (the round-4 production
    training-demo configuration) must run end-to-end with finite losses:
    bf16 activations, f32 params/optimizer."""
    import json

    from bdm_tpu.main import main

    save = str(tmp_path / "out")
    main(BASE_ARGS + [
        "run.job=train", f"run.save_dir={save}", "run.name=bf16",
        "run.mixed_precision=bf16", "run.max_steps=3",
        "run.checkpoint_freq=3", "run.print_step_freq=1",
        "run.log_step_freq=1", "scheduler.num_warmup_steps=1",
    ])
    log_path = os.path.join(save, "bf16", "train_log.jsonl")
    rows = [json.loads(line) for line in open(log_path)]
    assert rows and all(np.isfinite(r["loss"]) for r in rows)


def test_cli_train_and_sample(tmp_path, tiny_build):
    from bdm_tpu.main import main

    save = str(tmp_path / "out")
    main(BASE_ARGS + [
        "run.job=train", f"run.save_dir={save}", "run.name=smoke",
        "run.max_steps=3", "run.checkpoint_freq=3", "run.print_step_freq=1",
        "run.log_step_freq=1", "scheduler.num_warmup_steps=1",
        "run.val_freq=2", "run.limit_val_batches=1",
    ])
    ckpt = os.path.join(save, "smoke", "checkpoint-latest")
    assert os.path.exists(ckpt)
    log_path = os.path.join(save, "smoke", "train_log.jsonl")
    assert os.path.exists(log_path)
    # in-loop validation (run.val_freq) must have logged a val metric
    import json
    recs = [json.loads(line) for line in open(log_path)]
    assert any("val_loss" in r for r in recs), recs

    main(BASE_ARGS + [
        "run.job=sample", f"run.save_dir={save}", "run.name=smoke",
        f"checkpoint.resume={ckpt}", "run.num_sample_batches=1",
    ])
    plys = glob.glob(os.path.join(save, "smoke", "sample", "pred", "*",
                                  "*.ply"))
    assert len(plys) == 2  # batch of 2
    gts = glob.glob(os.path.join(save, "smoke", "sample", "gt", "*", "*.ply"))
    assert len(gts) == 2

    # the eval CLI consumes this exact layout
    from bdm_tpu.evaluation.cli import evaluate_dirs
    pred_dir = os.path.dirname(plys[0])
    gt_dir = os.path.dirname(gts[0])
    values, nans = evaluate_dirs(pred_dir, gt_dir, "cd")
    assert len(values) == 2 and not nans
