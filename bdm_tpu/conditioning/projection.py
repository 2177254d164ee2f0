"""Rasterized surface projection: lift image features onto visible points.

Semantics of the reference's `surface_projection`
(`model/projection_model.py:127-157` + PyTorch3D `PointsRasterizer` with
radius=0.0075, points_per_pixel=1): each point is projected to NDC; a pixel
is claimed by the nearest-in-z point whose NDC position lies within
`radius` of the pixel center; points that win a pixel receive that pixel's
feature vector, all other points receive zeros. (A point winning several
pixels receives one of them — the reference's `local_features_proj[idx] =`
scatter with duplicate indices keeps an arbitrary write.)

TPU design: a z-buffer built with a scatter-min over flattened pixel ids —
no sorting, no fragments structure. Two splat modes:

  * "multi" (default): each point competes for every pixel center within
    `radius` — a static K x K candidate window with K derived from
    radius/pitch. At the production setting (224 px, radius 0.0075 <
    pixel pitch 2/224) K=2, and the window provably contains ALL centers
    within radius, so this is EXACTLY the PyTorch3D rasterization.
  * "nearest": each point competes only for its single nearest center
    (round 1's approximation, kept for A/B measurement).

The projection runs per sampling step (it depends on x_t), but the feature
map itself is constant across steps and must be computed ONCE outside the
sampling scan — unlike the reference, which re-runs its ViT every step
(`projection_model.py:110-125` called from `get_input_with_conditioning`).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from bdm_tpu.conditioning.cameras import PerspectiveCamera

_INF = jnp.float32(3.4e38)


def project_points_to_pixels(points: jnp.ndarray, camera: PerspectiveCamera,
                             image_size: int, radius: float = 0.0075):
    """Project points; return (pixel_id, z, valid).

    pixel_id: (B, N) int32 flattened y*W + x of each point's nearest pixel
        center (W*H where invalid).
    z: (B, N) view-space depth.
    valid: (B, N) bool — in front of the camera, inside the image, and
        within `radius` of the pixel center in NDC.
    """
    s = image_size
    x_ndc, y_ndc, z = camera.transform_points_ndc(points)
    # pixel index i has NDC center 1 - (2i+1)/S  =>  i = (S*(1-ndc) - 1)/2
    x_pix_f = (s * (1.0 - x_ndc) - 1.0) / 2.0
    y_pix_f = (s * (1.0 - y_ndc) - 1.0) / 2.0
    x_pix = jnp.round(x_pix_f).astype(jnp.int32)
    y_pix = jnp.round(y_pix_f).astype(jnp.int32)

    # NDC distance from the point to its nearest pixel center
    pitch = 2.0 / s
    dx = (x_pix_f - x_pix) * pitch
    dy = (y_pix_f - y_pix) * pitch
    within = (dx * dx + dy * dy) < (radius * radius)

    inside = ((x_pix >= 0) & (x_pix < s) & (y_pix >= 0) & (y_pix < s)
              & (z > 0) & within)
    pixel_id = jnp.where(inside, y_pix * s + x_pix, s * s)
    return pixel_id, z, inside


def project_points_to_pixels_multi(points: jnp.ndarray,
                                   camera: PerspectiveCamera,
                                   image_size: int, radius: float):
    """Candidate pixels of each point: EVERY center within `radius` in NDC.

    Returns (pixel_id (B, N, K*K) int32, z (B, N), valid (B, N, K*K)) where
    K is the static per-axis candidate count. Since pixel centers form a
    grid of pitch 2/S in NDC, all centers within radius lie in a K-window
    around the point with K = floor(2*radius/pitch) + 1 — at the production
    radius (< pitch) K=2, i.e. the 4 corners of the point's pixel cell.
    This replicates the PointsRasterizer candidate test
    (`projection_model.py:87-92,141-145`).
    """
    s = image_size
    x_ndc, y_ndc, z = camera.transform_points_ndc(points)
    x_pix_f = (s * (1.0 - x_ndc) - 1.0) / 2.0
    y_pix_f = (s * (1.0 - y_ndc) - 1.0) / 2.0

    pitch = 2.0 / s
    rp = radius / pitch                     # radius in pixel units
    k = int(math.floor(2.0 * rp)) + 1

    # first integer strictly greater than x - rp
    x_base = jnp.floor(x_pix_f - rp).astype(jnp.int32) + 1
    y_base = jnp.floor(y_pix_f - rp).astype(jnp.int32) + 1
    offs = jnp.arange(k, dtype=jnp.int32)
    xs = x_base[..., None] + offs           # (B, N, K)
    ys = y_base[..., None] + offs

    dx = (x_pix_f[..., None] - xs) * pitch  # (B, N, K)
    dy = (y_pix_f[..., None] - ys) * pitch
    d2 = (dx * dx)[..., None, :] + (dy * dy)[..., :, None]  # (B, N, Ky, Kx)
    within = d2 < (radius * radius)

    inside = ((xs >= 0) & (xs < s))[..., None, :] \
        & ((ys >= 0) & (ys < s))[..., :, None] \
        & (z > 0)[..., None, None] & within
    pid = ys[..., :, None] * s + xs[..., None, :]            # (B, N, Ky, Kx)
    b, n = z.shape
    pid = jnp.where(inside, pid, s * s).reshape(b, n, k * k)
    return pid, z, inside.reshape(b, n, k * k), y_base, x_base


def surface_projection(points: jnp.ndarray, camera: PerspectiveCamera,
                       feature_map: jnp.ndarray, radius: float = 0.0075,
                       scale_factor: float = 1.0,
                       splat: str = "multi") -> jnp.ndarray:
    """Gather each visible point's pixel feature; zeros for occluded points.

    Args:
        points: (B, N, 3) world-space points (x_t positions).
        camera: batched camera (leading dim B).
        feature_map: (B, H, W, C) per-pixel conditioning (colors + ViT
            features [+ mask/distance transform]), or the same map
            pre-flattened to (B, H*W, C). Samplers flatten ONCE outside
            their scan: the in-scan reshape of the loop-invariant map
            costs a per-step (B, 224, 224, 387) layout copy (~86 us/step
            in the r3 profile) that XLA does not hoist out of the while
            body.
        radius: rasterization point radius in NDC.
        scale_factor: multiplies camera T (`projection_model.py:136-137`).
        splat: "multi" = exact PyTorch3D candidate set (default);
            "nearest" = single nearest-center approximation.

    Returns:
        (B, N, C) per-point features.
    """
    b, n, _ = points.shape
    if feature_map.ndim == 3:
        _, hw, c = feature_map.shape
        h = w = math.isqrt(hw)
        assert h * w == hw, "pre-flattened map must be square"
        flat = feature_map
    else:
        _, h, w, c = feature_map.shape
        assert h == w, "square images only (as in the reference)"
        flat = feature_map.reshape(b, h * w, c)
    if scale_factor != 1.0:
        camera = camera.scale_T(scale_factor)

    if splat == "nearest":
        pixel_id, z, valid = project_points_to_pixels(points, camera, h,
                                                      radius)
        z = jnp.where(valid, z, _INF)
        zbuf = jnp.full((b, h * w + 1), _INF, dtype=z.dtype)
        zbuf = zbuf.at[jnp.arange(b)[:, None], pixel_id].min(z)
        winner_z = jnp.take_along_axis(zbuf, pixel_id, axis=1)
        won = valid & (z <= winner_z)
        safe_id = jnp.minimum(pixel_id, h * w - 1)
        feats = jnp.take_along_axis(flat, safe_id[..., None], axis=1)
        return jnp.where(won[..., None], feats, 0.0)

    assert splat == "multi", splat
    pid, z, valid, y_base, x_base = project_points_to_pixels_multi(
        points, camera, h, radius)
    kk = pid.shape[-1]
    zc = jnp.where(valid, z[..., None], _INF)                # (B, N, KK)
    # 4N-row scatter-min. A sorted run-min variant (N scatter rows via
    # segmented suffix scans) was built and measured in r5: 29.8 vs
    # 28.6 ms/step — the log-N scan passes cost more than the 3N extra
    # scatter rows. Deleted.
    zbuf = jnp.full((b, h * w + 1), _INF, dtype=z.dtype)
    zbuf = zbuf.at[jnp.arange(b)[:, None, None], pid].min(zc)
    if kk == 4:
        # candidate pixels form a 2x2 window at (y_base, x_base): build a
        # 4-channel window image (3 shifted copies of the zbuf — one cheap
        # elementwise pass over the 225^2 image) and read winner_z as ONE
        # flat gather with a FULL lane dim (gather cost follows the START
        # count: N starts vs 4N for the per-candidate gather; a
        # vmap(dynamic_slice (2,2)) variant serialized into a 28 ms/step
        # while loop — lane-dim dynamic starts do not vectorize on TPU).
        # Clamped starts only affect candidates that are invalid anyway.
        zpad = jnp.pad(zbuf[:, :h * w].reshape(b, h, w),
                       ((0, 0), (1, 1), (1, 1)), constant_values=_INF)
        zw = jnp.stack([zpad[:, :-1, :-1], zpad[:, :-1, 1:],
                        zpad[:, 1:, :-1], zpad[:, 1:, 1:]],
                       axis=-1)                    # (B, H+1, W+1, 4)
        sy = jnp.clip(y_base, -1, h - 1) + 1                 # (B, N)
        sx = jnp.clip(x_base, -1, w - 1) + 1
        flat_idx = sy * (w + 1) + sx
        winner_z = jnp.take_along_axis(
            zw.reshape(b, (h + 1) * (w + 1), kk),
            flat_idx[..., None], axis=1)           # (B, N, 4)
    else:
        winner_z = jnp.take_along_axis(
            zbuf, pid.reshape(b, n * kk), axis=1).reshape(b, n, kk)
    won = valid & (zc <= winner_z)                           # (B, N, KK)
    # a point that won several pixels gets one of them (the reference's
    # duplicate-index scatter keeps an arbitrary write); take the first
    first = jnp.argmax(won, axis=-1)                         # (B, N)
    any_won = jnp.any(won, axis=-1)
    chosen = jnp.take_along_axis(pid, first[..., None], axis=-1)[..., 0]
    safe_id = jnp.minimum(chosen, h * w - 1)
    feats = jnp.take_along_axis(flat, safe_id[..., None], axis=1)
    return jnp.where(any_won[..., None], feats, 0.0)
