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
