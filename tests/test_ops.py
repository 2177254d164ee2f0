"""Golden tests for the point-cloud ops against independent NumPy
implementations of the documented CUDA semantics (SURVEY.md section 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu import ops


# ---------------------------------------------------------------- numpy refs

def np_fps(coords, m):
    """Sequential FPS per `sampling.cu:82-170`."""
    b, n, _ = coords.shape
    out = np.zeros((b, m), dtype=np.int32)
    for bi in range(b):
        dist = np.full(n, 1e38, dtype=np.float32)
        old = 0
        for j in range(1, m):
            d = np.sum((coords[bi] - coords[bi, old]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            old = int(np.argmax(dist))
            out[bi, j] = old
    return out


def np_ball_query(centers, points, radius, u):
    """Scan-order first-u semantics per `ball_query.cu:19-58`."""
    b, m, _ = centers.shape
    out = np.zeros((b, m, u), dtype=np.int32)
    r2 = radius ** 2
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(points.shape[1]):
                d2 = np.sum((centers[bi, j] - points[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
                    if cnt == u:
                        break
    return out


def np_avg_voxelize(features, vox_coords, r):
    b, n, c = features.shape
    out = np.zeros((b, r, r, r, c), dtype=np.float64)
    cnt = np.zeros((b, r, r, r), dtype=np.int64)
    for bi in range(b):
        for i in range(n):
            x, y, z = vox_coords[bi, i]
            out[bi, x, y, z] += features[bi, i]
            cnt[bi, x, y, z] += 1
    nz = np.maximum(cnt, 1)
    return (out / nz[..., None]).astype(np.float32)


def np_trilinear_devox(grid, coords):
    """Per `trilinear_devox.cu:37-104` incl. the frac>0 corner rule."""
    b, r, _, _, c = grid.shape
    n = coords.shape[1]
    out = np.zeros((b, n, c), dtype=np.float32)
    for bi in range(b):
        for i in range(n):
            x, y, z = coords[bi, i]
            lo = np.floor([x, y, z]).astype(int)
            fr = np.array([x, y, z]) - lo
            hi = lo + (fr > 0)
            for dx, xx in ((0, lo[0]), (1, hi[0])):
                for dy, yy in ((0, lo[1]), (1, hi[1])):
                    for dz, zz in ((0, lo[2]), (1, hi[2])):
                        w = ((fr[0] if dx else 1 - fr[0])
                             * (fr[1] if dy else 1 - fr[1])
                             * (fr[2] if dz else 1 - fr[2]))
                        out[bi, i] += w * grid[bi, xx, yy, zz]
    return out


def np_three_nn(points, centers):
    b, n, _ = points.shape
    idx = np.zeros((b, n, 3), dtype=np.int32)
    w = np.zeros((b, n, 3), dtype=np.float32)
    for bi in range(b):
        d2 = np.sum((points[bi][:, None] - centers[bi][None]) ** 2, axis=-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        best = np.take_along_axis(d2, order, axis=-1)
        best = np.clip(best, 1e-10, 1e10)
        d0, d1, d2_ = best[:, 0], best[:, 1], best[:, 2]
        denom = d0 * d1 + d0 * d2_ + d1 * d2_
        w[bi] = np.stack([d1 * d2_, d0 * d2_, d0 * d1], -1) / denom[:, None]
        idx[bi] = order
    return idx, w


# -------------------------------------------------------------------- tests

def test_fps_matches_reference(rng):
    coords = rng.standard_normal((2, 128, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 16))
    want = np_fps(coords, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_first_index_is_zero(rng):
    coords = rng.standard_normal((3, 64, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 8))
    assert (got[:, 0] == 0).all()


def test_ball_query_matches_reference(rng):
    points = rng.standard_normal((2, 200, 3)).astype(np.float32)
    centers = points[:, ::10]  # 20 centers
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                    radius=0.4, num_neighbors=8))
    want = np_ball_query(centers, points, 0.4, 8)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hit_is_zero(rng):
    points = np.ones((1, 16, 3), dtype=np.float32) * 100.0
    centers = np.zeros((1, 4, 3), dtype=np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                    radius=0.1, num_neighbors=4))
    np.testing.assert_array_equal(got, 0)


def test_avg_voxelize_matches_reference(rng):
    feats = rng.standard_normal((2, 100, 5)).astype(np.float32)
    vox = rng.integers(0, 4, size=(2, 100, 3)).astype(np.int32)
    got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox), 4))
    want = np_avg_voxelize(feats, vox, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_voxelize_grad_is_gather_over_count(rng):
    feats = rng.standard_normal((1, 10, 2)).astype(np.float32)
    vox = np.zeros((1, 10, 3), dtype=np.int32)  # all points in voxel 0
    g = jax.grad(lambda f: ops.avg_voxelize(f, jnp.asarray(vox), 2).sum())(
        jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g), 1.0 / 10.0, atol=1e-6)


def test_trilinear_devoxelize_matches_reference(rng):
    r = 4
    grid = rng.standard_normal((2, r, r, r, 3)).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(2, 50, 3)).astype(np.float32)
    got = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                              jnp.asarray(coords)))
    want = np_trilinear_devox(grid, coords)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_devoxelize_integer_coords_pick_exact_voxel(rng):
    r = 3
    grid = rng.standard_normal((1, r, r, r, 2)).astype(np.float32)
    coords = np.array([[[2.0, 2.0, 2.0], [0.0, 1.0, 2.0]]], dtype=np.float32)
    got = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                              jnp.asarray(coords)))
    np.testing.assert_allclose(got[0, 0], grid[0, 2, 2, 2], atol=1e-6)
    np.testing.assert_allclose(got[0, 1], grid[0, 0, 1, 2], atol=1e-6)


def test_three_nn_matches_reference(rng):
    points = rng.standard_normal((2, 60, 3)).astype(np.float32)
    centers = rng.standard_normal((2, 9, 3)).astype(np.float32)
    idx, w = ops.three_nn(jnp.asarray(points), jnp.asarray(centers))
    idx_ref, w_ref = np_three_nn(points, centers)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_three_nn_interpolate_exact_at_center(rng):
    centers = rng.standard_normal((1, 8, 3)).astype(np.float32)
    feats = rng.standard_normal((1, 8, 4)).astype(np.float32)
    out = ops.three_nn_interpolate(jnp.asarray(centers), jnp.asarray(centers),
                                   jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(out), feats, atol=1e-4)


def test_grouping_shapes_and_values(rng):
    feats = rng.standard_normal((2, 20, 6)).astype(np.float32)
    idx = rng.integers(0, 20, size=(2, 5, 3)).astype(np.int32)
    got = np.asarray(ops.grouping(jnp.asarray(feats), jnp.asarray(idx)))
    assert got.shape == (2, 5, 3, 6)
    for bi in range(2):
        np.testing.assert_allclose(got[bi], feats[bi][idx[bi]])


def test_normalize_coords_range(rng):
    coords = rng.standard_normal((2, 100, 3)).astype(np.float32) * 5
    norm, vox = ops.normalize_coords(jnp.asarray(coords), 32)
    norm, vox = np.asarray(norm), np.asarray(vox)
    assert norm.min() >= 0 and norm.max() <= 31
    assert vox.min() >= 0 and vox.max() <= 31


def _pipeline(coords, feats):
    """Exercises every op in one jitted graph (the PVCNN SA/FP data path)."""
    idx = ops.furthest_point_sample(coords, 8)
    centers = ops.gather(coords, idx)
    nbr = ops.ball_query(centers, coords, 0.5, 4)
    grouped = ops.grouping(feats, nbr)
    pooled = grouped.max(axis=2)
    up = ops.three_nn_interpolate(coords, centers, pooled)
    norm, vox = ops.normalize_coords(coords, 8)
    grid = ops.avg_voxelize(up, vox, 8)
    return ops.trilinear_devoxelize(grid, norm)


def test_ops_are_jittable(rng):
    coords = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((1, 64, 4)).astype(np.float32))
    out = jax.jit(_pipeline)(coords, feats)
    assert out.shape == (1, 64, 4)


def test_pallas_fps_matches_reference(rng):
    """The Pallas FPS kernel (interpret mode on CPU) must agree with the
    pure-JAX/NumPy reference implementation."""
    from bdm_tpu.ops.pallas import furthest_point_sample_pallas
    coords = rng.standard_normal((2, 256, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(coords), 32, True))
    want = np_fps(coords, 32)
    np.testing.assert_array_equal(got, want)


def test_pallas_ball_query_matches_reference(rng):
    from bdm_tpu.ops.pallas import ball_query_pallas
    points = rng.standard_normal((2, 256, 3)).astype(np.float32)
    centers = points[:, ::2]  # 128 centers (one pallas tile)
    got = np.asarray(ball_query_pallas(jnp.asarray(centers),
                                       jnp.asarray(points), 0.4, 8, True))
    want = np_ball_query(centers, points, 0.4, 8)
    np.testing.assert_array_equal(got, want)


def test_pallas_three_nn_matches_reference(rng):
    from bdm_tpu.ops.pallas import three_nn_pallas
    points = rng.standard_normal((2, 64, 3)).astype(np.float32)
    centers = rng.standard_normal((2, 9, 3)).astype(np.float32)
    idx, w = three_nn_pallas(jnp.asarray(points), jnp.asarray(centers), True)
    idx_ref, w_ref = np_three_nn(points, centers)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)


def test_avg_voxelize_ctx_matches_standalone(rng):
    """The scatter-free (sort+cumsum+searchsorted) context path must equal
    the standalone scatter-mean for random clouds."""
    coords = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((3, 64, 7)).astype(np.float32))
    r = 4
    from bdm_tpu.ops.voxelize import normalize_coords
    _, vox = normalize_coords(coords, r)
    want = ops.avg_voxelize(feats, vox, r)
    ctx = ops.make_voxel_context(coords, r)
    got = ops.avg_voxelize_ctx(feats, ctx, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_avg_voxelize_ctx_grad_matches_standalone(rng):
    coords = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 32, 5)).astype(np.float32))
    r = 3
    from bdm_tpu.ops.voxelize import normalize_coords
    _, vox = normalize_coords(coords, r)
    ctx = ops.make_voxel_context(coords, r)
    # weighted sum so the gradient is nontrivial per output element
    w = jnp.asarray(rng.standard_normal((2, r, r, r, 5)).astype(np.float32))
    g_ctx = jax.grad(
        lambda f: (ops.avg_voxelize_ctx(f, ctx, r) * w).sum())(feats)
    g_ref = jax.grad(
        lambda f: (ops.avg_voxelize(f, jnp.asarray(vox), r) * w).sum())(feats)
    np.testing.assert_allclose(np.asarray(g_ctx), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_scatter_sum_pallas_interpret_matches_segment_sum(rng):
    """The MXU matmul-scatter (interpret mode) equals segment_sum."""
    from bdm_tpu.ops.pallas.voxelize import scatter_sum_pallas
    b, n, c, segs = 2, 40, 5, 16
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, segs, (b, n)).astype(np.int32))
    got = scatter_sum_pallas(feats, ids, segs, interpret=True)
    flat = (ids + jnp.arange(b)[:, None] * segs).reshape(-1)
    want = jax.ops.segment_sum(feats.reshape(b * n, c), flat,
                               num_segments=b * segs).reshape(b, segs, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_trilinear_devoxelize_window_form_matches(rng):
    """The TPU window-gather form equals the 8-corner gather everywhere,
    including exact-integer coords at the R-1 edge (corner rule)."""
    from bdm_tpu.ops.voxelize import _trilinear_devoxelize_window
    b, r, c, n = 2, 4, 6, 50
    grid = jnp.asarray(rng.standard_normal((b, r, r, r, c)).astype(
        np.float32))
    coords = jnp.asarray(
        rng.uniform(0, r - 1, (b, n, 3)).astype(np.float32))
    # force exact-integer and edge coords into the mix
    coords = coords.at[:, :8].set(
        jnp.asarray(rng.integers(0, r, (b, 8, 3)).astype(np.float32)
                    .clip(0, r - 1)))
    want = ops.trilinear_devoxelize(grid, coords)  # CPU: 8-corner path
    got = _trilinear_devoxelize_window(grid, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_scatter_sum_sorted_pallas_interpret(rng):
    """Sorted-range matmul-scatter == segment_sum (interpret mode),
    including multi-chunk tiles and empty tiles."""
    from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas
    b, n, c, segs = 2, 64, 5, 16   # tile_v = 16 -> 1 tile? min(512,16)=16
    ids = np.sort(rng.integers(0, segs, (b, n)), axis=1).astype(np.int32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    tile_v = 16
    t = segs // tile_v
    lo = np.zeros((b, t + 1), np.int32)
    for bi in range(b):
        for ti in range(t):
            lo[bi, ti] = np.searchsorted(ids[bi], ti * tile_v)
        lo[bi, t] = n
    got = scatter_sum_sorted_pallas(jnp.asarray(feats), jnp.asarray(ids),
                                    jnp.asarray(lo), segs, interpret=True)
    flat = (ids + np.arange(b)[:, None] * segs).reshape(-1)
    want = np.zeros((b * segs, c), np.float32)
    np.add.at(want, flat, feats.reshape(-1, c))
    np.testing.assert_allclose(np.asarray(got),
                               want.reshape(b, segs, c), rtol=2e-2,
                               atol=2e-2)


def test_scatter_sum_sorted_pallas_multichunk_clamped(rng):
    """Regression: a voxel tile holding > MAXP points whose sorted range
    starts chunk-unaligned. The second chunk's start gets clamped back to
    n - MAXP; a tile-level validity bound would re-admit (and double-count)
    positions the first chunk already summed."""
    from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_pallas
    b, c, segs = 1, 5, 1024          # tile_v = 512 -> 2 tiles
    tile_v, t = 512, 2
    # 100 points in tile 0, 1300 (> maxp=1024) in tile 1: tile 1's range
    # [100, 1400) spans two chunks and chunk 1's start (1124) clamps to 376
    ids = np.sort(np.concatenate([
        rng.integers(0, tile_v, 100),
        rng.integers(tile_v, segs, 1300)])).astype(np.int32)[None]
    n = ids.shape[1]
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    lo = np.zeros((b, t + 1), np.int32)
    for ti in range(t):
        lo[0, ti] = np.searchsorted(ids[0], ti * tile_v)
    lo[0, t] = n
    got = scatter_sum_sorted_pallas(jnp.asarray(feats), jnp.asarray(ids),
                                    jnp.asarray(lo), segs, interpret=True)
    want = np.zeros((segs, c), np.float32)
    np.add.at(want, ids[0], feats[0])
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=2e-2,
                               atol=2e-2)


def test_conv3d_wide_matches_xla_conv(rng):
    """The matmul-first wide conv == XLA's SAME conv3d (bf16 tolerance)."""
    from bdm_tpu.ops.conv_wide import conv3d_wide
    b, r, cin, cout = 2, 4, 7, 5
    x = rng.standard_normal((b, r, r, r, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1, 1), "SAME",
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST) + bias
    got = conv3d_wide(jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_conv3d_wide_grad_matches(rng):
    """conv3d_wide is differentiable and its grad matches the XLA conv's."""
    from bdm_tpu.ops.conv_wide import conv3d_wide
    b, r, cin, cout = 1, 3, 6, 4
    x = rng.standard_normal((b, r, r, r, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    bias = np.zeros((cout,), np.float32)
    w = rng.standard_normal((b, r, r, r, cout)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))

    def f_ref(xx):
        return (jax.lax.conv_general_dilated(
            xx, jnp.asarray(k), (1, 1, 1), "SAME", dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST) * w).sum()

    def f_wide(xx):
        return (conv3d_wide(xx, jnp.asarray(k), jnp.asarray(bias)) * w).sum()

    g_ref = jax.grad(f_ref)(jnp.asarray(x))
    g_wide = jax.grad(f_wide)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_wide), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


def test_conv3d_mm_pallas_interpret_matches_xla(rng):
    """Matmul-first Pallas conv (interpret) == XLA SAME conv."""
    from bdm_tpu.ops.pallas.conv3d import conv3d_mm_pallas
    b, r, cin, cout = 2, 4, 7, 5
    x = rng.standard_normal((b, r, r, r, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1, 1), "SAME",
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST) + bias
    got = conv3d_mm_pallas(jnp.asarray(x), jnp.asarray(k),
                           jnp.asarray(bias), r, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_conv3d_mm_grad_matches(rng):
    """conv3d_mm (custom-vjp wrapper) gradient == the XLA conv's.

    On CPU the forward auto-selects the Pallas interpreter, so this
    exercises the production vjp wiring (fwd residuals + _conv3d_bwd)."""
    from bdm_tpu.ops.pallas.conv3d import conv3d_mm
    b, r, cin, cout = 1, 3, 6, 4
    x = rng.standard_normal((b, r, r, r, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    bias = np.zeros((cout,), np.float32)
    w = rng.standard_normal((b, r, r, r, cout)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))

    def f_ref(xx, kk):
        return (jax.lax.conv_general_dilated(
            xx, kk, (1, 1, 1), "SAME", dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST) * w).sum()

    def f_mm(xx, kk):
        return (conv3d_mm(xx, kk, jnp.asarray(bias), r) * w).sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(k))
    g_mm = jax.grad(f_mm, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(k))
    for a, b_ in zip(g_mm, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-2, atol=5e-2)


def test_scatter_sum_sorted_padded_pallas_interpret(rng):
    """Padded-layout sorted scatter == pad(segment_sum) (interpret mode):
    pad rows zero, interior slice-major sums, bf16 store rounding."""
    from bdm_tpu.ops.pallas.voxelize import scatter_sum_sorted_padded_pallas
    b, n, c, r = 2, 64, 5, 4
    hw, r3 = r * r, r ** 3
    tile_v = min(512, hw)
    ids = np.sort(rng.integers(0, r3, (b, n)), axis=1).astype(np.int32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    t = r3 // tile_v
    lo = np.zeros((b, t + 1), np.int32)
    for bi in range(b):
        for ti in range(t):
            lo[bi, ti] = np.searchsorted(ids[bi], ti * tile_v)
        lo[bi, t] = n
    got = scatter_sum_sorted_padded_pallas(
        jnp.asarray(feats), jnp.asarray(ids), jnp.asarray(lo), r,
        jnp.float32)
    flat = (ids + np.arange(b)[:, None] * r3).reshape(-1)
    want = jax.ops.segment_sum(
        jnp.asarray(feats).reshape(b * n, c), jnp.asarray(flat),
        num_segments=b * r3).reshape(b, r, hw, c)
    assert got.shape == (b, r + 2, hw, c)
    np.testing.assert_allclose(np.asarray(got[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(got[:, r + 1]), 0.0)
    np.testing.assert_allclose(np.asarray(got[:, 1:r + 1]),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_avg_voxelize_padded_ctx_matches_and_grads(rng):
    """avg_voxelize_padded_ctx == pad(avg_voxelize_ctx) and its gradient
    matches the unpadded op's (the pad rows carry no cotangent)."""
    b, n, c, r = 2, 48, 5, 4
    coords = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    ctx = ops.make_voxel_context(coords, r)
    got = ops.avg_voxelize_padded_ctx(feats, ctx, r, jnp.float32)
    want = ops.avg_voxelize_ctx(feats, ctx, r).reshape(b, r, r * r, c)
    np.testing.assert_allclose(np.asarray(got[:, 1:r + 1]),
                               np.asarray(want), rtol=1e-5, atol=1e-6)
    w = jnp.asarray(rng.standard_normal(got.shape).astype(np.float32))
    g_pad = jax.grad(lambda f: (ops.avg_voxelize_padded_ctx(
        f, ctx, r, jnp.float32) * w).sum())(feats)
    g_ref = jax.grad(lambda f: (ops.avg_voxelize_ctx(
        f, ctx, r).reshape(b, r, r * r, c) * w[:, 1:r + 1]).sum())(feats)
    np.testing.assert_allclose(np.asarray(g_pad), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_attention_pallas_interpret(rng):
    """Blocked attention kernel (interpret) == f32 softmax(qk^T)v, no
    1/sqrt(C) scale — within bf16 input rounding."""
    from bdm_tpu.ops.pallas.attention import attention_pallas
    b, s, c = 2, 1024, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, c)).astype(
        np.float32)).astype(jnp.bfloat16) for _ in range(3))
    got = attention_pallas(q, k, v).astype(jnp.float32)
    logits = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    w = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("bij,bjc->bic", w, v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_attention_pallas_grad(rng):
    """The custom VJP (XLA-einsum backward) matches grads of the plain
    einsum attention — PVConv training differentiates this op."""
    from bdm_tpu.ops.pallas.attention import attention_pallas
    b, s, c = 1, 512, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, c)).astype(
        np.float32)).astype(jnp.bfloat16) for _ in range(3))

    def ref(q, k, v):
        logits = jnp.einsum("bic,bjc->bij", q, k,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bij,bjc->bic", w, v)

    def loss_k(q, k, v):
        return jnp.sum(attention_pallas(q, k, v).astype(jnp.float32) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(ref(q, k, v).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_conv3d_ms_shape_sweep(rng):
    """conv3d_ms == per-slab kernel across production-like R/C combos
    (interpret mode), covering every ds-table branch incl. odd batch."""
    from bdm_tpu.ops.pallas.conv3d import conv3d_ms_pallas, conv3d_pallas
    for b, r, cin, cout in [(1, 2, 8, 8), (3, 4, 16, 8), (2, 8, 16, 32),
                            (1, 16, 8, 16), (1, 32, 16, 16)]:
        x = jnp.asarray(rng.standard_normal((b, r, r, r, cin)).astype(
            np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.2)
                        .astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        got = conv3d_ms_pallas(x, k, bias, r, True)
        ref = conv3d_pallas(x, k, bias, r, True)
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        scale = float(jnp.abs(ref.astype(jnp.float32)).max()) + 1e-6
        assert err <= 0.05 * scale + 0.02, (b, r, cin, cout, err, scale)


def test_conv3d_ms_prepadded_matches_unpadded(rng):
    """conv3d_ms over the D-padded (B, R+2, HW, C) fused-scatter layout
    == conv3d_ms over the plain grid (the narrow-branch PVConv route)."""
    from bdm_tpu.ops.pallas.conv3d import conv3d_ms_pallas
    for b, r, cin, cout in [(2, 4, 16, 8), (1, 8, 32, 16)]:
        x = jnp.asarray(rng.standard_normal((b, r, r, r, cin)).astype(
            np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray((rng.standard_normal((3, 3, 3, cin, cout)) * 0.2)
                        .astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        want = conv3d_ms_pallas(x, k, bias, r, True, 2)
        gp = jnp.pad(x.reshape(b, r, r * r, cin),
                     ((0, 0), (1, 1), (0, 0), (0, 0)))
        got = conv3d_ms_pallas(gp, k, bias, r, True, None, "roll", True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv3d_ms_prepadded_grad_matches(rng):
    """conv3d_ms_prepadded (custom-vjp wrapper) gradient == XLA conv's
    through the pad rows (which carry zero cotangent)."""
    from bdm_tpu.ops.pallas.conv3d import conv3d_ms_prepadded
    b, r, cin, cout = 1, 4, 6, 4
    x = rng.standard_normal((b, r, r * r, cin)).astype(np.float32)
    gp = jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (0, 0), (0, 0)))
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.2).astype(np.float32)
    bias = np.zeros((cout,), np.float32)
    w = rng.standard_normal((b, r, r, r, cout)).astype(np.float32)
    dn = jax.lax.conv_dimension_numbers(
        (b, r, r, r, cin), k.shape, ("NDHWC", "DHWIO", "NDHWC"))

    def f_ref(gpad, kk):
        xx = gpad[:, 1:r + 1].reshape(b, r, r, r, cin)
        return (jax.lax.conv_general_dilated(
            xx, kk, (1, 1, 1), "SAME", dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST) * w).sum()

    def f_ms(gpad, kk):
        return (conv3d_ms_prepadded(gpad, kk, jnp.asarray(bias), r)
                * w).sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1))(gp, jnp.asarray(k))
    g_ms = jax.grad(f_ms, argnums=(0, 1))(gp, jnp.asarray(k))
    for a, b_ in zip(g_ms, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-2, atol=5e-2)


def test_interp_mm_matches_gather(rng):
    """One-hot matmul 3-NN interpolation == the gather form within bf16
    rounding; gradient wrt features matches the gather path."""
    from bdm_tpu.ops.pallas.interp_mm import interp_mm

    b, n, m, c = 2, 512, 128, 64
    idx = jnp.asarray(rng.integers(0, m, (b, n, 3)).astype(np.int32))
    w_raw = rng.random((b, n, 3)).astype(np.float32) + 0.1
    w = jnp.asarray(w_raw / w_raw.sum(-1, keepdims=True))
    feats = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)

    gathered = jnp.take_along_axis(
        feats.astype(jnp.float32), idx.reshape(b, n * 3, 1),
        axis=1).reshape(b, n, 3, c)
    want = jnp.sum(gathered * w[..., None], axis=2)
    got = interp_mm(idx, w, feats).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    gcot = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))

    def f_mm(f):
        return (interp_mm(idx, w, f) * gcot.astype(jnp.bfloat16)).sum()

    def f_ref(f):
        gg = jnp.take_along_axis(
            f.astype(jnp.float32), idx.reshape(b, n * 3, 1),
            axis=1).reshape(b, n, 3, c)
        return (jnp.sum(gg * w[..., None], axis=2) * gcot).sum()

    g_mm = jax.grad(f_mm)(feats).astype(jnp.float32)
    g_ref = jax.grad(f_ref)(feats.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


def test_three_nn_interpolate_onehot_dispatch(rng, monkeypatch):
    """BDM_INTERP=onehot dispatches the FP interpolation to the matmul
    kernel and stays close to the gather path end-to-end."""
    from bdm_tpu.ops.interpolate import three_nn_interpolate

    b, n, m, c = 1, 512, 128, 32
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    cen = jnp.asarray(rng.standard_normal((b, m, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    want = three_nn_interpolate(pts, cen, feats)
    monkeypatch.setenv("BDM_INTERP", "onehot")
    got = three_nn_interpolate(pts, cen, feats)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want.astype(jnp.float32)),
                               rtol=3e-2, atol=3e-2)
