"""Config parsing / CLI surface / IO tests."""

import numpy as np
import pytest

from bdm_tpu.config import parse_cli
from bdm_tpu.utils import read_ply, write_ply


def test_defaults_match_reference():
    cfg = parse_cli([])
    assert cfg.model.beta_start == 1e-5 and cfg.model.beta_end == 8e-3
    assert cfg.model.image_size == 224  # interpolated from dataset
    assert cfg.optimizer.clip_grad_norm == 50.0
    assert cfg.scheduler.num_training_steps == 100_000  # ${run.max_steps}
    assert cfg.ema.decay == 0.999 and cfg.ema.update_every == 20


def test_dotted_overrides_and_types():
    cfg = parse_cli([
        "run.job=sample", "run.num_inference_steps=64",
        "dataset.subset_ratio=0.1", "dataset.max_points=4096",
        "aux_run.milestones=[1000,968,936,872,128,64,32,0]",
        "aux_run.roll_step=16", "run.manual_seed=null",
        "logging.wandb=false",
    ])
    assert cfg.run.job == "sample"
    assert cfg.run.num_inference_steps == 64
    assert cfg.dataset.subset_ratio == 0.1
    assert cfg.aux_run.milestones == [1000, 968, 936, 872, 128, 64, 32, 0]
    assert cfg.run.manual_seed is None
    assert cfg.logging.wandb is False


def test_group_selection():
    cfg = parse_cli(["dataset=pix3d", "scheduler=fusion",
                     "run.max_fusion_steps=20000"])
    assert cfg.dataset.type == "pix3d"
    assert cfg.dataset.pc_dict == "pix3d.json"
    assert cfg.scheduler.num_warmup_steps == 200
    assert cfg.scheduler.num_training_steps == 20000  # ${run.max_fusion_steps}


def test_interpolation_follows_override_order():
    cfg = parse_cli(["dataset.image_size=128", "dataset.scale_factor=2.0"])
    assert cfg.model.image_size == 128
    assert cfg.model.scale_factor == 2.0


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        parse_cli(["dataset.nonexistent=1"])
    with pytest.raises(ValueError):
        parse_cli(["dataset=not_a_dataset"])


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts)
    back = read_ply(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_evaluation_cli_end_to_end(tmp_path, rng):
    from bdm_tpu.evaluation.cli import evaluate_dirs
    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    pred.mkdir()
    gt.mkdir()
    for i in range(3):
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        write_ply(str(pred / f"s{i}.ply"), pts)
        write_ply(str(gt / f"s{i}.ply"), pts)  # identical -> CD 0, F1 1
    values, nans = evaluate_dirs(str(pred), str(gt), "cd")
    assert len(values) == 3 and max(values) < 1e-3 and not nans
    values, _ = evaluate_dirs(str(pred), str(gt), "f1")
    assert min(values) > 0.999


def test_sample_from_ema_param_extraction():
    """run.sample_from_ema selects ema_params and errors when absent
    (never silently falls back to raw weights)."""
    import pytest
    from bdm_tpu.cli import _extract_params
    ckpt = {"params": {"w": 1}, "ema_params": {"w": 2}, "step": 3}
    assert _extract_params(ckpt, None) == {"w": 1}
    assert _extract_params(ckpt, None, from_ema=True) == {"w": 2}
    with pytest.raises(ValueError, match="ema_params"):
        _extract_params({"params": {"w": 1}, "step": 3}, None,
                        from_ema=True)
    with pytest.raises(ValueError, match="bare"):
        _extract_params({"w": 1}, None, from_ema=True)
