"""PVCNN2 / PVCNNFuse structural tests (tiny specs for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu.models import PVCNN2, PVCNNFuse
from bdm_tpu.models.pvcnn import build_pvcnn2_specs

TINY_SA = (
    ((8, 2, 4), (16, 0.3, 8, (8, 16))),
    ((16, 2, 4), (8, 0.4, 8, (16, 32))),
    (None, (4, 0.8, 8, (32, 64))),
)
TINY_FP = (
    ((32, 32), (16, 1, 4)),
    ((16, 16), (16, 1, 4)),
    ((16, 8), (8, 1, 4)),
)


def tiny_model(extra=5, out=3):
    return PVCNN2(out_channels=out, embed_dim=8, extra_feature_channels=extra,
                  sa_blocks=TINY_SA, fp_blocks=TINY_FP)


def test_spec_builder_matches_reference_channels():
    """Channel accounting for the real specs (PC2: extra=387)."""
    specs = build_pvcnn2_specs(extra_feature_channels=387)
    assert specs.sa_in_channels == (387, 64, 128, 256)
    assert specs.channels_sa_features == 512
    # stage 0 keeps both convs; stages 1-2 keep exactly one; stage 3 none
    assert [len(s.convs) for s in specs.sa_stages] == [2, 1, 1, 0]
    # attention only on stage 1's first conv (odd stage, p==0)
    att = [[c.attention for c in s.convs] for s in specs.sa_stages]
    assert att == [[False, False], [True], [False], []]
    # FP: all convs present, never attention (reference shadowing bug)
    assert [len(s.convs) for s in specs.fp_stages] == [3, 3, 2, 2]
    assert not any(c.attention for s in specs.fp_stages for c in s.convs)


def test_pvcnn2_forward_shape_and_grad():
    model = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 8)).astype(np.float32))
    t = jnp.array([5, 900])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient reaches the encoder (end-to-end differentiability through
    # FPS/ball-query/voxelize paths)
    enc = g["params"]["encoder"]
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(enc))
    assert total > 0


def test_pvcnn2_classifier_near_zero_init():
    model = tiny_model()
    x = jnp.zeros((1, 16, 8))
    t = jnp.array([0])
    params = model.init(jax.random.PRNGKey(1), x, t)
    k = params["params"]["decoder"]["classifier_out"]["kernel"]
    assert float(jnp.abs(k).max()) < 1e-4  # N(0, 1e-6^2)


def test_pvcnn2_pvd_variant_zero_extra_channels():
    """PVD consumes bare xyz (extra_feature_channels=0,
    `pvd/__init__.py:343-349`)."""
    model = PVCNN2(out_channels=3, embed_dim=8, extra_feature_channels=0,
                   sa_blocks=TINY_SA, fp_blocks=TINY_FP,
                   classifier_init_scale=None)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 3)).astype(np.float32))
    t = jnp.array([10, 10])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_full_size_param_count():
    """The real PC2 backbone should land in the reference's ~10-40M range
    (evaluated shape-only, no FLOPs)."""
    model = PVCNN2(out_channels=3, embed_dim=64, extra_feature_channels=387)
    x = jax.ShapeDtypeStruct((1, 4096, 390), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree_util.tree_leaves(shapes))
    assert 10_000_000 < n_params < 60_000_000, n_params


@pytest.mark.parametrize("mode", ["fusion_nstep", "fusion_1step"])
def test_fusion_forward_and_zero_conv_identity(mode):
    model = PVCNNFuse(out_channels=3, embed_dim=8, extra_feature_channels=5,
                      sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    rng = np.random.default_rng(2)
    recon = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    prior1 = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    prior2 = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    t = jnp.array([3, 3])
    params = model.init(jax.random.PRNGKey(0), recon, prior1, t, mode)
    out1 = model.apply(params, recon, prior1, t, mode)
    out2 = model.apply(params, recon, prior2, t, mode)
    assert out1.shape == (2, 32, 3)
    # zero-conv init: the prior branch cannot influence the output yet
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    # and the parameter tree has the expected frozen/trainable split
    # (tiny specs have 3 SA stages -> 2 skip projs + bottleneck proj2)
    top = set(params["params"].keys())
    assert {"pc2_encoder", "pvd_encoder", "decoder", "embedf",
            "proj0", "proj1", "proj2"} <= top


def test_bf16_compute_dtype_reaches_activations():
    """mixed_precision='bf16' must actually narrow the activation stream
    (VERDICT r2: run.mixed_precision was a silently-dead key)."""
    from bdm_tpu.samplers.pc2 import compute_dtype_of
    assert compute_dtype_of("bf16") == jnp.bfloat16
    assert compute_dtype_of("fp16") == jnp.bfloat16  # TPU-native alias
    assert compute_dtype_of("no") is None
    with pytest.raises(ValueError):
        compute_dtype_of("int8")

    model = PVCNN2(out_channels=3, embed_dim=8, extra_feature_channels=5,
                   sa_blocks=TINY_SA, fp_blocks=TINY_FP, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out, state = model.apply(params, x, t, capture_intermediates=True)
    # eps prediction itself stays f32 (classifier head is an f32 island)
    assert out.dtype == jnp.float32
    inter = state["intermediates"]
    flat = jax.tree_util.tree_leaves(inter)
    dtypes = {jnp.dtype(l.dtype) for l in flat if hasattr(l, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in dtypes, sorted(map(str, dtypes))
    # params stay f32
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_bf16_forward_close_to_f32():
    """Same params, bf16 vs f32 compute: outputs finite and close."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    t = jnp.asarray([100, 500], jnp.int32)
    kw = dict(out_channels=3, embed_dim=8, extra_feature_channels=5,
              sa_blocks=TINY_SA, fp_blocks=TINY_FP,
              classifier_init_scale=None)
    m32 = PVCNN2(**kw)
    m16 = PVCNN2(**kw, dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x, t)
    o32 = m32.apply(params, x, t)
    o16 = m16.apply(params, x, t)
    assert np.isfinite(np.asarray(o16)).all()
    scale = np.abs(np.asarray(o32)).max() + 1e-6
    err = np.abs(np.asarray(o16) - np.asarray(o32)).max() / scale
    assert err < 0.15, err


def test_pc2_mixed_precision_wiring():
    """ProjectionConfig.mixed_precision flows to the backbone dtype."""
    from bdm_tpu.samplers import PC2Model, ProjectionConfig, PVDModel
    from tests.test_models import TINY_FP, TINY_SA
    cfg = ProjectionConfig(image_size=16, image_feature_model="identity",
                           point_cloud_model_embed_dim=8,
                           mixed_precision="bf16")
    pc2 = PC2Model(cfg, sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    assert pc2.backbone.dtype == jnp.bfloat16
    pvd = PVDModel(embed_dim=8, sa_blocks=TINY_SA, fp_blocks=TINY_FP,
                   mixed_precision="bf16")
    assert pvd.backbone.dtype == jnp.bfloat16


def test_pvconv_tpu_path_matches_cpu_path(rng):
    """The TPU-gated PVConv pipeline (Pallas scatter + ms conv + padded
    wide scatter) run in interpret mode must match the plain CPU path
    within bf16 rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bdm_tpu.models.pvcnn import PVConv
    from bdm_tpu.ops.sampling import set_pallas_enabled

    b, n = 2, 128
    for cin, res in [(16, 8), (288, 8)]:   # narrow + wide (>256) paths
        feats = jnp.asarray(
            rng.standard_normal((b, n, cin)).astype(np.float32))
        coords = jnp.asarray(
            rng.standard_normal((b, n, 3)).astype(np.float32))
        m = PVConv(out_channels=16, resolution=res, dropout=0.0)
        params = m.init(jax.random.PRNGKey(0), feats, coords)
        want = m.apply(params, feats, coords, deterministic=True)
        set_pallas_enabled(True)
        try:
            got = m.apply(params, feats, coords, deterministic=True)
        finally:
            set_pallas_enabled(None)
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)), rtol=0.1, atol=0.05,
            err_msg=f"cin={cin}")
