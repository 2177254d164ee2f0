"""Point-axis (sequence-parallel) geometry ops == their single-device
counterparts, bit-exactly, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu.ops.ball_query import ball_query
from bdm_tpu.ops.interpolate import three_nn
from bdm_tpu.ops.sampling import furthest_point_sample, fps_gather
from bdm_tpu.parallel.mesh import get_mesh
from bdm_tpu.parallel.point_sharded import (ball_query_point_sharded,
                                            fps_gather_point_sharded,
                                            fps_point_sharded,
                                            three_nn_point_sharded)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend")
    return get_mesh(8, "sp")


def test_fps_point_sharded_matches(rng, mesh):
    b, n, m = 2, 256, 33
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    want = furthest_point_sample(coords, m, use_pallas=False)
    got = fps_point_sharded(coords, m, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_point_sharded_duplicate_points(rng, mesh):
    """fp ties (duplicate points) must break to the lowest global index,
    like jnp.argmax's first-occurrence rule on the full array."""
    b, n, m = 1, 64, 16
    base = rng.standard_normal((b, n // 2, 3)).astype(np.float32)
    coords = jnp.asarray(np.concatenate([base, base], axis=1))
    want = furthest_point_sample(coords, m, use_pallas=False)
    got = fps_point_sharded(coords, m, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_gather_point_sharded_matches(rng, mesh):
    b, n, m = 2, 128, 17
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    want = fps_gather(coords, m)
    got = fps_gather_point_sharded(coords, m, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)


def test_ball_query_point_sharded_matches(rng, mesh):
    b, n, mq, u, radius = 2, 256, 16, 9, 0.7
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    cen = jnp.asarray(rng.standard_normal((b, mq, 3)).astype(np.float32))
    want = ball_query(cen, pts, radius, u, use_pallas=False)
    got = ball_query_point_sharded(cen, pts, radius, u, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_point_sharded_u_exceeds_shard(rng, mesh):
    """U larger than the per-shard point count pads with the miss marker
    before the merge."""
    b, n, mq, u, radius = 1, 64, 8, 12, 1.5   # shard_n = 8 < U
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    cen = jnp.asarray(rng.standard_normal((b, mq, 3)).astype(np.float32))
    want = ball_query(cen, pts, radius, u, use_pallas=False)
    got = ball_query_point_sharded(cen, pts, radius, u, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_point_sharded_no_hits(mesh):
    """Zero-hit centers keep the zero-filled output."""
    b, n, mq, u = 1, 64, 4, 5
    pts = jnp.ones((b, n, 3), jnp.float32)
    cen = jnp.full((b, mq, 3), 100.0, jnp.float32)
    got = ball_query_point_sharded(cen, pts, 0.5, u, mesh)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_three_nn_point_sharded_matches(rng, mesh):
    b, n, mq = 2, 128, 24
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    cen = jnp.asarray(rng.standard_normal((b, mq, 3)).astype(np.float32))
    want_i, want_w = three_nn(pts, cen, use_pallas=False)
    got_i, got_w = three_nn_point_sharded(pts, cen, mesh)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=0, atol=0)


def test_grouping_point_sharded_matches(rng, mesh):
    from bdm_tpu.ops.grouping import grouping
    from bdm_tpu.parallel.point_sharded import grouping_point_sharded
    b, n, c, m, u = 2, 128, 7, 16, 4
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, m, u)).astype(np.int32))
    want = grouping(feats, idx)
    got = grouping_point_sharded(feats, idx, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_point_to_voxel_to_point_sharded_matches(rng, mesh):
    """The full PVConv voxel branch under point sharding: scatter-mean
    partials merged by psum, replicated voxel_fn, parallel devox. Equal
    to the unsharded path up to psum reassociation."""
    from bdm_tpu.ops.voxelize import point_to_voxel_to_point
    from bdm_tpu.parallel.point_sharded import \
        point_to_voxel_to_point_sharded
    b, n, c, r = 2, 256, 5, 4

    def voxel_fn(grid):
        return jnp.tanh(grid) + grid * 0.5

    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    want = point_to_voxel_to_point(feats, coords, r, voxel_fn)
    got = point_to_voxel_to_point_sharded(feats, coords, r, voxel_fn, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sa_stage_data_path_point_sharded(rng, mesh):
    """Composed SA-stage data path (FPS -> center gather -> ball query ->
    grouping) fully point-sharded == unsharded, bit-exactly — the
    sequence-parallel large-N recipe end to end (SURVEY.md 2.7)."""
    from bdm_tpu.ops.grouping import grouping
    from bdm_tpu.parallel.point_sharded import grouping_point_sharded
    b, n, c, m, u, radius = 2, 256, 6, 32, 8, 0.7
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))

    centers_u = fps_gather(coords, m)
    nbr_u = ball_query(centers_u, coords, radius, u, use_pallas=False)
    want = grouping(feats, nbr_u)

    centers = fps_gather_point_sharded(coords, m, mesh)
    nbr = ball_query_point_sharded(centers, coords, radius, u, mesh)
    got = grouping_point_sharded(feats, nbr, mesh)
    np.testing.assert_allclose(np.asarray(centers), np.asarray(centers_u),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(nbr), np.asarray(nbr_u))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


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


def test_pvcnn2_full_backbone_point_sharded(rng, mesh):
    """The FULL PVCNN2 forward with the fine point axis sequence-parallel
    over the 8-device mesh == the unsharded forward (same params), up to
    float-reduction reassociation. Geometry ops ride the bit-identical
    shard_map collectives; SharedMLPs/grid convs/GroupNorms partition
    under GSPMD (cross-shard GN stats are XLA-inserted all-reduces)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bdm_tpu.models.pvcnn import PVCNN2
    b, n, extra = 2, 256, 5
    common = dict(out_channels=3, embed_dim=8,
                  extra_feature_channels=extra, sa_blocks=TINY_SA,
                  fp_blocks=TINY_FP, classifier_init_scale=None)
    model = PVCNN2(**common)
    inputs = jnp.asarray(
        rng.standard_normal((b, n, 3 + extra)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), inputs, t)
    want = model.apply(params, inputs, t)

    model_sp = PVCNN2(**common, sp_mesh=mesh, sp_min_points=64)
    x_sp = jax.device_put(inputs, NamedSharding(mesh, P(None, "sp", None)))
    got = jax.jit(model_sp.apply)(params, x_sp, t)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=5e-5)


def test_pvcnn2_point_sharded_grad_matches(rng, mesh):
    """Gradients flow through the sequence-parallel forward (shard_map
    collectives + GSPMD partitions are differentiable) and match the
    unsharded gradients — the SP path is trainable, not inference-only."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bdm_tpu.models.pvcnn import PVCNN2
    b, n, extra = 2, 128, 5
    common = dict(out_channels=3, embed_dim=8,
                  extra_feature_channels=extra, sa_blocks=TINY_SA,
                  fp_blocks=TINY_FP, classifier_init_scale=None)
    model = PVCNN2(**common)
    model_sp = PVCNN2(**common, sp_mesh=mesh, sp_min_points=64)
    inputs = jnp.asarray(
        rng.standard_normal((b, n, 3 + extra)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), inputs, t)

    def loss(m):
        return lambda p, x: jnp.mean((m.apply(p, x, t) - tgt) ** 2)

    g_want = jax.grad(loss(model))(params, inputs)
    x_sp = jax.device_put(inputs, NamedSharding(mesh, P(None, "sp", None)))
    g_got = jax.jit(jax.grad(loss(model_sp)))(params, x_sp)
    flat_w, _ = jax.tree_util.tree_flatten(g_want)
    flat_g, _ = jax.tree_util.tree_flatten(g_got)
    assert len(flat_w) == len(flat_g)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=1e-5)


def test_pvcnn2_point_sharded_composes_with_dp(rng):
    """SP composes with data parallelism on a 2-D (dp=2, sp=4) mesh: the
    shard_map islands are manual only over "sp" (axis_names), so GSPMD
    keeps the batch axis partitioned straight through them."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU backend")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from bdm_tpu.models.pvcnn import PVCNN2
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 ("dp", "sp"))
    b, n, extra = 2, 256, 5
    common = dict(out_channels=3, embed_dim=8,
                  extra_feature_channels=extra, sa_blocks=TINY_SA,
                  fp_blocks=TINY_FP, classifier_init_scale=None)
    model = PVCNN2(**common)
    inputs = jnp.asarray(
        rng.standard_normal((b, n, 3 + extra)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), inputs, t)
    want = model.apply(params, inputs, t)

    model_sp = PVCNN2(**common, sp_mesh=mesh2, sp_min_points=64)
    x_sp = jax.device_put(inputs,
                          NamedSharding(mesh2, P("dp", "sp", None)))
    got = jax.jit(model_sp.apply)(params, x_sp, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=5e-5)
