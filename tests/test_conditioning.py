"""Camera math + surface projection tests."""

import jax.numpy as jnp
import numpy as np

from bdm_tpu.conditioning import (
    PerspectiveCamera,
    camera_from_r2n2,
    compute_extrinsic_matrix,
    surface_projection,
)
from bdm_tpu.conditioning.cameras import compute_camera_calibration


def identity_camera(b=1, focal=2.0):
    return PerspectiveCamera(
        R=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        T=jnp.broadcast_to(jnp.array([0.0, 0.0, 2.0]), (b, 3)),
        focal_length=jnp.full((b, 2), focal),
        principal_point=jnp.zeros((b, 2)),
    )


def test_transform_points_ndc_center():
    cam = identity_camera()
    pts = jnp.array([[[0.0, 0.0, 0.0]]])
    x, y, z = cam.transform_points_ndc(pts)
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), 2.0, atol=1e-6)


def test_transform_points_ndc_offaxis():
    cam = identity_camera(focal=2.0)
    # view point (0.5, -0.25, 2) -> ndc (2*0.5/2, 2*-0.25/2) = (0.5, -0.25)
    pts = jnp.array([[[0.5, -0.25, 0.0]]])
    x, y, _ = cam.transform_points_ndc(pts)
    np.testing.assert_allclose(np.asarray(x)[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[0, 0], -0.25, atol=1e-6)


def test_surface_projection_zbuffer_and_occlusion():
    s = 8
    cam = identity_camera()
    # Two points projecting to the same pixel; the nearer (smaller z) wins.
    near = [0.0, 0.0, -0.5]   # z_view = 1.5
    far = [0.0, 0.0, 0.5]     # z_view = 2.5
    pts = jnp.array([[near, far]])
    fmap = jnp.arange(s * s, dtype=jnp.float32).reshape(1, s, s, 1)
    out = np.asarray(surface_projection(pts, cam, fmap, radius=0.4,
                                        splat="nearest"))
    # ndc (0,0) -> pixel float (8*1-1)/2 = 3.5 -> rounds to 4 -> id 4*8+4=36
    assert out[0, 0, 0] == 36.0  # winner gets the pixel feature
    assert out[0, 1, 0] == 0.0   # occluded point gets zeros
    # multi mode: the winner claims SOME center within radius; the
    # occluded point still gets zeros (it loses every shared candidate)
    out_m = np.asarray(surface_projection(pts, cam, fmap, radius=0.4,
                                          splat="multi"))
    assert out_m[0, 0, 0] > 0.0
    assert out_m[0, 1, 0] == 0.0


def test_surface_projection_out_of_frustum_is_zero():
    s = 8
    cam = identity_camera()
    pts = jnp.array([[[10.0, 0.0, 0.0],    # far outside the image
                      [0.0, 0.0, -3.0]]])  # behind the camera (z = -1)
    fmap = jnp.ones((1, s, s, 2))
    out = np.asarray(surface_projection(pts, cam, fmap, radius=0.4))
    np.testing.assert_array_equal(out, 0.0)


def test_surface_projection_radius_gates_coverage():
    s = 8
    cam = identity_camera()
    pts = jnp.array([[[0.0, 0.0, 0.0]]])  # pixel float coord 3.5: 0.5px off
    fmap = jnp.ones((1, s, s, 1))
    # 0.5 px = 0.125 NDC here; a radius below that must drop the point
    out_small = np.asarray(surface_projection(pts, cam, fmap, radius=0.05))
    out_big = np.asarray(surface_projection(pts, cam, fmap, radius=0.2))
    assert out_small[0, 0, 0] == 0.0
    assert out_big[0, 0, 0] == 1.0


def test_extrinsic_matrix_camera_at_origin_lookat():
    """The camera computed from (azim, elev, dist) keeps the origin at
    distance `dist` on the optical axis."""
    rt = compute_extrinsic_matrix(azimuth=33.0, elevation=12.0, distance=1.4)
    r, t = compute_camera_calibration(rt)
    cam = PerspectiveCamera(
        R=jnp.asarray(r, jnp.float32)[None],
        T=jnp.asarray(t, jnp.float32)[None],
        focal_length=jnp.full((1, 2), 2.1875),
        principal_point=jnp.zeros((1, 2)),
    )
    x, y, z = cam.transform_points_ndc(jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(x)[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y)[0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z)[0, 0], 1.4, atol=1e-5)


def test_camera_from_r2n2_formula_transcription():
    """Our camera matches an independent numpy transcription of the
    reference's fold (`shapenet_r2n2.py:65-95`)."""
    rng = np.random.default_rng(3)
    rt = compute_extrinsic_matrix(azimuth=120.0, elevation=25.0, distance=1.2)
    r, t = compute_camera_calibration(rt)
    mean = rng.standard_normal(3).astype(np.float64) * 0.1
    std = 0.37

    cam = camera_from_r2n2(r, t, mean, std)

    s3 = np.diag([-1.0, -1.0, 1.0])
    rp, tp = r @ s3, t @ s3
    want_r = rp * std
    want_t = mean @ rp / std + tp
    want_r[:, :2] *= -1
    want_t[:2] *= -1
    np.testing.assert_allclose(np.asarray(cam.R)[0], want_r, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.T)[0], want_t, atol=1e-5)
    assert float(cam.focal_length[0, 0]) == 2.1875


def test_camera_from_r2n2_exact_when_mean_zero():
    """With mean=0 the fold is exact: normalized points x/std under the
    folded camera give the same NDC as raw points under the raw camera
    (depth scales by 1/std). (With mean != 0 the reference's formula is
    only approximate — verified numerically — and we replicate it as-is.)
    """
    rng = np.random.default_rng(4)
    rt = compute_extrinsic_matrix(azimuth=45.0, elevation=30.0, distance=1.0)
    r, t = compute_camera_calibration(rt)
    std = 0.37
    cam_norm = camera_from_r2n2(r, t, np.zeros(3), std)
    cam_raw = camera_from_r2n2(r, t, np.zeros(3), 1.0)

    pts_raw = rng.standard_normal((1, 16, 3)).astype(np.float32) * 0.2
    xn, yn, zn = cam_norm.transform_points_ndc(jnp.asarray(pts_raw / std))
    xr, yr, zr = cam_raw.transform_points_ndc(jnp.asarray(pts_raw))
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(yr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zn), np.asarray(zr), atol=1e-5)


def _rasterize_oracle(points, cam, s, radius):
    """Brute-force PyTorch3D PointsRasterizer semantics
    (points_per_pixel=1): for EACH pixel center, the nearest-in-z point
    within `radius` of it claims the pixel. Returns {point: set(pixel_id)}.
    """
    x, y, z = (np.asarray(a) for a in cam.transform_points_ndc(
        jnp.asarray(points)))
    b, n = z.shape
    pitch = 2.0 / s
    centers = 1.0 - (2 * np.arange(s) + 1) / s  # NDC center of col/row i
    wins = [dict() for _ in range(b)]
    for bi in range(b):
        for yi in range(s):
            for xi in range(s):
                d2 = (x[bi] - centers[xi]) ** 2 + (y[bi] - centers[yi]) ** 2
                ok = (d2 < radius ** 2) & (z[bi] > 0)
                if not ok.any():
                    continue
                zs = np.where(ok, z[bi], np.inf)
                p = int(np.argmin(zs))
                wins[bi].setdefault(p, set()).add(yi * s + xi)
    return wins


def test_surface_projection_multi_matches_bruteforce_rasterizer():
    """The 'multi' splat must reproduce the exact rasterizer: every point
    that wins >= 1 pixel receives one of ITS won pixels' features; all
    others get zeros. Uses radius < pitch (the production regime) and a
    radius > pitch (wide window) case."""
    rng = np.random.default_rng(0)
    s = 16
    for radius in (0.05, 0.2):  # pitch = 0.125
        pts = jnp.asarray(
            (rng.standard_normal((2, 40, 3)) * 0.4).astype(np.float32))
        cam = identity_camera(b=2)
        # feature = its own flat pixel id, so winners are identifiable
        fmap = jnp.arange(s * s, dtype=jnp.float32).reshape(
            1, s, s, 1).repeat(2, axis=0)
        out = np.asarray(surface_projection(pts, cam, fmap, radius=radius,
                                            splat="multi"))[..., 0]
        wins = _rasterize_oracle(pts, cam, s, radius)
        for bi in range(2):
            for p in range(40):
                if p in wins[bi]:
                    assert int(out[bi, p]) in wins[bi][p], (
                        bi, p, out[bi, p], wins[bi][p])
                else:
                    assert out[bi, p] == 0.0, (bi, p, out[bi, p])


def test_surface_projection_multi_vs_nearest_differ():
    """The two splat modes genuinely differ (multi lets a point claim a
    non-nearest center AND lets off-center points occlude pixels they
    aren't nearest to — both directions change assignments); the A/B delta
    at production-like density is recorded in ARCHITECTURE.md."""
    rng = np.random.default_rng(1)
    s = 32
    pts = jnp.asarray(
        (rng.standard_normal((4, 512, 3)) * 0.3).astype(np.float32))
    cam = identity_camera(b=4)
    fmap = jnp.ones((4, s, s, 1), jnp.float32)
    radius = 0.05  # pitch = 0.0625, radius < pitch: production regime
    near = np.asarray(surface_projection(pts, cam, fmap, radius=radius,
                                         splat="nearest"))[..., 0]
    multi = np.asarray(surface_projection(pts, cam, fmap, radius=radius,
                                          splat="multi"))[..., 0]
    assert (multi > 0).any() and (near > 0).any()
    assert ((multi > 0) != (near > 0)).any()


def test_surface_projection_accepts_preflattened_map():
    """Samplers flatten the loop-invariant map to (B, H*W, C) once outside
    their scan (the in-scan reshape costs a per-step layout copy); the flat
    form must be numerically identical to the 4-D form."""
    s = 16
    rng = np.random.default_rng(7)
    cam = identity_camera()
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 64, 3)).astype(np.float32))
    fmap = jnp.asarray(rng.standard_normal((1, s, s, 5)).astype(np.float32))
    for splat in ("multi", "nearest"):
        ref = np.asarray(surface_projection(pts, cam, fmap, radius=0.1,
                                            splat=splat))
        flat = np.asarray(surface_projection(
            pts, cam, fmap.reshape(1, s * s, 5), radius=0.1, splat=splat))
        np.testing.assert_array_equal(ref, flat)


def test_cast_cond_for_sampling_preflattens():
    """PC2Model prepares the conditioning map for a sampling scan by
    flattening (and casting under mixed precision) exactly once."""
    from bdm_tpu.samplers.pc2 import PC2Model, ProjectionConfig

    pc2 = PC2Model(ProjectionConfig(
        image_size=32, image_feature_model="identity",
        use_local_features=False, mixed_precision="bf16"))
    m = jnp.ones((2, 32, 32, 3), jnp.float32)
    out = pc2._cast_cond_for_sampling(m)
    assert out.shape == (2, 32 * 32, 3) and out.dtype == jnp.bfloat16
    # idempotent: preparing an already-prepared map is a no-op
    out2 = pc2._cast_cond_for_sampling(out)
    assert out2.shape == out.shape and out2.dtype == out.dtype
