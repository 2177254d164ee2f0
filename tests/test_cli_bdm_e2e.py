"""End-to-end CLI smoke tests for the BDM coupled samplers: the blending
CLI and the merging CLI (train + sample), with tiny backbones swapped in —
completing e2e coverage of all three entry points (main.py is covered by
test_cli_e2e.py)."""

import glob
import os

import jax
import pytest

import bdm_tpu.cli as cli
import bdm_tpu.main_blending as mb
import bdm_tpu.main_merging as mm
from bdm_tpu.samplers import BDMMergingModel, PC2Model, PVDModel
from tests.test_models import TINY_FP, TINY_SA

BASE_ARGS = [
    "dataset=synthetic", "dataset.image_size=16", "dataset.max_points=32",
    "model.image_feature_model=identity",
    "model.point_cloud_model_embed_dim=8",
    "dataloader.batch_size=2", "dataloader.num_workers=0",
    "run.num_inference_steps=8", "logging.wandb=false",
    "run.num_sample_batches=1",
    "aux_run.roll_step=2", "aux_run.milestones=[8,6,2,0]",
]


@pytest.fixture
def tiny_builders(monkeypatch):
    def build_pc2(cfg, ckpt=None, from_ema=False):
        pc2 = PC2Model(cli.projection_config(cfg), sa_blocks=TINY_SA,
                       fp_blocks=TINY_FP)
        params = pc2.init_params(jax.random.PRNGKey(0),
                                 num_points=cfg.dataset.max_points)
        return pc2, params

    def build_pvd(cfg, ckpt=None):
        pvd = PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        params = pvd.init_params(jax.random.PRNGKey(1),
                                 num_points=cfg.dataset.max_points)
        return pvd, params

    def build_fusion(cfg, pc2, pc2_params, pvd_params, ckpt=None):
        merge = BDMMergingModel(cli.projection_config(cfg), pc2=pc2,
                                sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        params = merge.init_from_pretrained(
            jax.random.PRNGKey(2), pc2_params, pvd_params,
            num_points=cfg.dataset.max_points)
        if ckpt:
            from bdm_tpu.train.checkpoint import load_params
            restored = load_params(ckpt, template=None)
            params = cli._extract_params(restored, params)
        return merge, params

    for mod in (cli, mb, mm):
        for name, fn in (("build_pc2", build_pc2), ("build_pvd", build_pvd),
                         ("build_fusion", build_fusion)):
            if hasattr(mod, name):
                monkeypatch.setattr(mod, name, fn)
    return build_pc2


def test_cli_blending_e2e(tmp_path, tiny_builders):
    save = str(tmp_path / "out")
    mb.main(BASE_ARGS + [
        "run.job=sample_bdm_blending", f"run.save_dir={save}",
        "run.name=blend",
    ])
    plys = glob.glob(os.path.join(save, "blend", "sample_bdm_blending",
                                  "pred", "*", "*.ply"))
    assert len(plys) == 2


def test_cli_merging_train_and_sample(tmp_path, tiny_builders):
    save = str(tmp_path / "out")
    mm.main(BASE_ARGS + [
        "run.job=training_bdm_merging", f"run.save_dir={save}",
        "run.name=merge", "run.max_fusion_steps=2", "run.checkpoint_freq=2",
        "run.print_step_freq=1", "run.log_step_freq=1",
        "scheduler.num_warmup_steps=1",
    ])
    ckpt = os.path.join(save, "merge", "checkpoint-latest")
    assert os.path.exists(ckpt)

    mm.main(BASE_ARGS + [
        "run.job=sample_bdm_merging", f"run.save_dir={save}",
        "run.name=merge", f"aux_run.fusion_ckpt={ckpt}",
    ])
    plys = glob.glob(os.path.join(save, "merge", "sample_bdm_merging",
                                  "pred", "*", "*.ply"))
    assert len(plys) == 2
