"""End-to-end torch->orbax->sample->eval chain at PRODUCTION layout
(VERDICT r3 next-step #7).

Real released BDM checkpoints are unavailable in this environment (zero
egress — BASELINE.md documents the search), so this test keeps the full
acceptance path warm with SYNTHETIC torch checkpoints in the reference's
exact key layout: it emits production-spec PyTorch state dicts (PC2 under
`{'model': {'point_cloud_model.model.*'}}`, PVD under
`{'model_state': {'model.module.*'}}` with DataParallel prefixes —
`pvd/__init__.py:480-484`), converts them with the real
`tools/convert_checkpoint.py` CLI, samples BDM-Blending through the real
`bdm_tpu.main_blending` CLI from the converted orbax checkpoints, and
evaluates the resulting .ply directories with `bdm_tpu.evaluation.cli`.
The day real weights appear, the CD/F1 parity run is these same three
commands (`/root/reference/README.md:144-183`).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _to_torch(sd):
    import torch
    return {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
            for k, v in sd.items()}


def _convert(kind, src, dst, in_channels):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
         "--kind", kind, "--src", src, "--dst", dst,
         "--in_channels", str(in_channels)],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]


@pytest.mark.slow
def test_torch_checkpoint_to_eval_chain(tmp_path, capsys):
    import torch

    from bdm_tpu.models.pvcnn import build_pvcnn2_specs
    from bdm_tpu.samplers import PC2Model, PVDModel
    from tests.test_convert_torch import make_torch_state_dict, _tree_equal

    # 1. production-spec models with random weights stand in for the
    #    released checkpoints (layout is what's under test, not values)
    pc2 = PC2Model()
    pvd = PVDModel()
    pc2_params = pc2.init_params(jax.random.PRNGKey(11), num_points=256)
    pvd_params = pvd.init_params(jax.random.PRNGKey(12), num_points=256)

    # 2. emit reference-layout torch checkpoints
    pc2_specs = build_pvcnn2_specs(
        extra_feature_channels=pc2.in_channels - 3)
    pvd_specs = build_pvcnn2_specs(extra_feature_channels=0)
    sd_pc2 = make_torch_state_dict(pc2_params["point_cloud_model"],
                                   pc2_specs,
                                   prefix="point_cloud_model.model")
    sd_pvd = make_torch_state_dict(pvd_params, pvd_specs,
                                   prefix="model.module")
    pc2_pth = str(tmp_path / "pc2_chair.pth")
    pvd_pth = str(tmp_path / "pvd_chair.pth")
    torch.save({"model": _to_torch(sd_pc2)}, pc2_pth)
    torch.save({"model_state": _to_torch(sd_pvd)}, pvd_pth)

    # 3. the real converter CLI -> orbax checkpoint dirs
    pc2_ckpt = str(tmp_path / "ckpt_pc2")
    pvd_ckpt = str(tmp_path / "ckpt_pvd")
    _convert("pc2", pc2_pth, pc2_ckpt, pc2.in_channels)
    _convert("pvd", pvd_pth, pvd_ckpt, pc2.in_channels)

    # 3b. the converted backbone must round-trip bit-exactly (production
    #     key layout incl. the DataParallel 'module.' strip)
    from bdm_tpu.train.checkpoint import load_params
    restored_pc2 = load_params(pc2_ckpt, template=None)
    _tree_equal(
        jax.tree_util.tree_map(np.asarray,
                               pc2_params["point_cloud_model"])["params"],
        restored_pc2["point_cloud_model"]["params"])
    restored_pvd = load_params(pvd_ckpt, template=None)
    _tree_equal(jax.tree_util.tree_map(np.asarray, pvd_params)["params"],
                restored_pvd["params"])

    # 4. BDM-Blending sampling from the converted checkpoints via the CLI
    #    (partial checkpoint: ViT params come from init — strict=False
    #    semantics, reference training_utils.py:332)
    import bdm_tpu.main_blending as mb
    save = str(tmp_path / "out")
    mb.main([
        "run.job=sample_bdm_blending", f"run.save_dir={save}",
        "run.name=chain", "dataset=synthetic", "dataset.image_size=224",
        "dataset.max_points=4096", "dataloader.batch_size=1",
        "dataloader.num_workers=0", "run.num_inference_steps=8",
        "aux_run.milestones=[8,6,2,0]", "aux_run.roll_step=2",
        "run.num_sample_batches=1", "logging.wandb=false",
        f"aux_run.recon_ckpt={pc2_ckpt}", f"aux_run.prior_ckpt={pvd_ckpt}",
    ])
    pred = os.path.join(save, "chain", "sample_bdm_blending", "pred",
                        "chair")
    gt = os.path.join(save, "chain", "sample_bdm_blending", "gt",
                      "chair")
    assert os.listdir(pred) and os.listdir(gt)

    # 5. the evaluation CLI over the .ply directories
    from bdm_tpu.evaluation import cli as ecli
    ecli.main(["--pred_dir", pred, "--gt_dir", gt, "--metric", "both"])
    out = capsys.readouterr().out
    assert "Chamfer-L2 x1000:" in out and "F1@" in out
    cd = float(out.split("Chamfer-L2 x1000:")[1].split()[0])
    assert np.isfinite(cd) and cd > 0  # random weights: no quality claim
