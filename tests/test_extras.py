"""Tests for the auxiliary components: distance transform, alt backbones,
coloring model, generative metrics, vis utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import TINY_FP, TINY_SA


def test_distance_transform_matches_definition(rng):
    from bdm_tpu.conditioning.distance_transform import \
        compute_distance_transform
    mask = np.zeros((1, 16, 16), dtype=np.float32)
    mask[0, 8, 8] = 1.0
    dt = compute_distance_transform(mask)
    assert dt.shape == (1, 16, 16, 1)
    assert dt[0, 8, 8, 0] == 0.0  # foreground pixel has distance 0
    assert dt[0, 0, 0, 0] > 0.5  # far corner is far (clipped at 1)
    assert dt.max() <= 1.0


def test_simple_point_model_forward(rng):
    from bdm_tpu.models.simple import SimplePointModel
    model = SimplePointModel(out_channels=3, embed_dim=8,
                             extra_feature_channels=5, dim=16, num_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 24, 8)).astype(np.float32))
    t = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # near-zero output head init
    assert float(jnp.abs(out).max()) < 1e-3


def test_pvcnn_plus_plus_forward(rng):
    from bdm_tpu.models.simple import PVCNN2PlusPlus
    model = PVCNN2PlusPlus(out_channels=3, embed_dim=8,
                           extra_feature_channels=5, dim=16)
    # patch the inner PVCNN to tiny specs via dataclass replace at call time
    import bdm_tpu.models.simple as simple_mod
    orig = simple_mod.PVCNN2
    try:
        import functools
        simple_mod.PVCNN2 = functools.partial(
            orig, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
        x = jnp.asarray(rng.standard_normal((1, 32, 8)).astype(np.float32))
        t = jnp.array([5])
        params = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(params, x, t)
    finally:
        simple_mod.PVCNN2 = orig
    assert out.shape == (1, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_coloring_model_loss_and_predict(rng):
    from bdm_tpu.models.coloring import PointCloudColoringModel
    from bdm_tpu.samplers import ProjectionConfig
    from bdm_tpu.conditioning import PerspectiveCamera

    cfg = ProjectionConfig(
        image_size=16, image_feature_model="identity",
        raster_point_radius=0.3, predict_shape=False, predict_color=True,
        point_cloud_model_embed_dim=8)
    model = PointCloudColoringModel(cfg, point_cloud_model_layers=1,
                                    sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    params = model.init_params(jax.random.PRNGKey(0), num_points=32)
    b, n = 2, 32
    batch = {
        "points": jnp.asarray(rng.standard_normal((b, n, 3)).astype(
            np.float32)),
        "colors": jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(
            np.float32)),
        "image": jnp.asarray(rng.uniform(0, 1, (b, 16, 16, 3)).astype(
            np.float32)),
        "camera": PerspectiveCamera(
            R=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            T=jnp.broadcast_to(jnp.array([0.0, 0.0, 2.0]), (b, 3)),
            focal_length=jnp.full((b, 2), 2.0),
            principal_point=jnp.zeros((b, 2))),
    }
    loss = model.loss(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    colors = model.predict(params, batch)
    assert colors.shape == (b, n, 3)
    assert float(colors.min()) >= 0.0 and float(colors.max()) <= 1.0


def test_gen_metrics(rng):
    from bdm_tpu.evaluation.gen_metrics import (
        jsd_between_point_cloud_sets,
        mmd_cov,
        one_nna,
    )
    ref = rng.standard_normal((4, 64, 3)).astype(np.float32) * 0.2
    # identical sets: MMD ~ 0, COV = 1, 1-NNA degenerate, JSD 0
    mmd, cov = mmd_cov(jnp.asarray(ref), jnp.asarray(ref))
    assert mmd < 1e-5 and cov == 1.0
    jsd = jsd_between_point_cloud_sets(ref, ref)
    assert jsd < 1e-12
    # disjoint sets: high 1-NNA (easily separable)
    far = ref + 5.0
    acc = one_nna(jnp.asarray(ref), jnp.asarray(far))
    assert acc > 0.9


def test_vis_utils(tmp_path, rng):
    from bdm_tpu.utils.vis import dump_metadata, render_evolution, \
        render_point_cloud
    pc = rng.standard_normal((128, 3)).astype(np.float32)
    p1 = str(tmp_path / "pc.png")
    render_point_cloud(pc, p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "evo.png")
    render_evolution([pc, pc * 0.5, pc * 0.1], p2)
    assert os.path.getsize(p2) > 0
    p3 = str(tmp_path / "meta.json")
    dump_metadata(p3, seed=42, scheduler="ddpm")
    assert "ddpm" in open(p3).read()


def test_wandb_logger_with_stub(monkeypatch):
    """WandbLogger drives a real wandb-shaped module (stubbed): init with
    project/name/config, scalar log with step, finish (reference
    `main.py:47-66,239-252`)."""
    import sys
    import types

    calls = {"init": [], "log": [], "finish": 0}

    class _Run:
        def log(self, metrics, step=None):
            calls["log"].append((dict(metrics), step))

        def finish(self):
            calls["finish"] += 1

    stub = types.ModuleType("wandb")
    def _init(project=None, name=None, config=None):
        calls["init"].append((project, name, config))
        return _Run()
    stub.init = _init
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from bdm_tpu.utils.vis import WandbLogger
    lg = WandbLogger(True, "proj", "run1", config={"a": 1})
    lg.log({"loss": 0.5}, step=3)
    lg.finish()
    assert calls["init"] == [("proj", "run1", {"a": 1})]
    assert calls["log"] == [({"loss": 0.5}, 3)]
    assert calls["finish"] == 1

    # disabled -> everything is a no-op even with wandb importable
    lg2 = WandbLogger(False, "proj", "run2")
    lg2.log({"x": 1.0})
    lg2.finish()
    assert len(calls["log"]) == 1


def test_wandb_logger_unavailable_is_noop(monkeypatch):
    import builtins
    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb in this env")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    import sys
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    from bdm_tpu.utils.vis import WandbLogger
    lg = WandbLogger(True, "proj", "run")
    assert lg.run is None
    lg.log({"x": 1.0})  # must not raise
    lg.finish()
