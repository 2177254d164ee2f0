"""Perspective cameras with PyTorch3D conventions, as plain arrays.

PyTorch3D conventions used by the reference:
  * world -> view is row-vector: X_view = X_world @ R + T
  * the camera looks down +Z; NDC +X is LEFT, +Y is UP
  * in-NDC perspective projection: x_ndc = fx * x/z + px, y_ndc = fy * y/z + py

The R2N2 camera construction (`dataset/shapenet_r2n2.py:46-95`) folds the
dataset-global normalization (mean/std) into R and T, uses focal 2.1875 and
flips the first two columns/components (PyTorch3D's screen +X/+Y flip).
Being a NamedTuple of arrays, a camera batches/shards/scans like any pytree.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# R2N2 intrinsics (`shapenet_r2n2.py:46-53`): focal 2.1875, the z rows are
# irrelevant for the NDC x/y math.
R2N2_FOCAL = 2.1875
MAX_CAMERA_DISTANCE = 1.75  # `shapenet_r2n2.py:374-380`


class PerspectiveCamera(NamedTuple):
    """Batched perspective camera (a pytree of arrays).

    R: (B, 3, 3); T: (B, 3); focal_length: (B, 2); principal_point: (B, 2).
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray

    def scale_T(self, scale: float) -> "PerspectiveCamera":
        """Reference scales camera distance by scaling T
        (`projection_model.py:136-137`)."""
        return self._replace(T=self.T * scale)

    def transform_points_ndc(self, points: jnp.ndarray):
        """World points (B, N, 3) -> (x_ndc, y_ndc, z_view).

        The einsum is pinned to HIGHEST precision: on TPU, f32 dots default
        to bf16 inputs, and ~2e-3 NDC error is half a pixel at 224px — the
        same reason the reference pins rasterization to fp32
        (`projection_model.py:127`). The cost is negligible (3x3 matrices).
        """
        view = jnp.einsum("bnj,bjk->bnk", points, self.R,
                          precision=jax.lax.Precision.HIGHEST
                          ) + self.T[:, None, :]
        z = view[..., 2]
        inv_z = 1.0 / z
        x_ndc = (self.focal_length[:, None, 0] * view[..., 0]
                 + self.principal_point[:, None, 0] * z) * inv_z
        y_ndc = (self.focal_length[:, None, 1] * view[..., 1]
                 + self.principal_point[:, None, 1] * z) * inv_z
        return x_ndc, y_ndc, z


def camera_from_screen(r: np.ndarray, t: np.ndarray, focal_px: tuple,
                       principal_px: tuple, image_size: int
                       ) -> PerspectiveCamera:
    """Build an NDC camera from screen-space intrinsics (PyTorch3D
    `in_ndc=False` semantics, used by the Pix3D loader — `pix3d.py:152-159`).

    For a square image of side S: f_ndc = f_px * 2/S and the principal
    point maps left-edge->+1 / right-edge->-1: p_ndc = (S - 2*p_px)/S.
    """
    s = float(image_size)
    fx, fy = focal_px
    px, py = principal_px
    return PerspectiveCamera(
        R=jnp.asarray(r, jnp.float32)[None],
        T=jnp.asarray(t, jnp.float32)[None],
        focal_length=jnp.asarray([[fx * 2.0 / s, fy * 2.0 / s]],
                                 dtype=jnp.float32),
        principal_point=jnp.asarray(
            [[(s - 2.0 * px) / s, (s - 2.0 * py) / s]], dtype=jnp.float32),
    )


def compute_extrinsic_matrix(azimuth: float, elevation: float,
                             distance: float) -> np.ndarray:
    """R2N2 metadata (azim, elev, dist) -> 4x4 world-to-camera matrix,
    including the Blender 90-degree quirk (`dataset/utils.py:40-84`)."""
    az = -math.pi * float(azimuth) / 180.0
    el = -math.pi * float(elevation) / 180.0
    sa, ca = math.sin(az), math.cos(az)
    se, ce = math.sin(el), math.cos(el)
    r_world2obj = np.array([
        [ca * ce, sa * ce, -se],
        [-sa, ca, 0.0],
        [ca * se, sa * se, ce],
    ])
    r_obj2cam = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    r_world2cam = r_obj2cam @ r_world2obj
    cam_location = np.array([[float(distance), 0.0, 0.0]]).T
    t_world2cam = -(r_obj2cam @ cam_location)
    rt = np.concatenate([r_world2cam, t_world2cam], axis=1)
    rt = np.concatenate([rt, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    rot = np.array([[1.0, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])
    return rt @ rot


def camera_from_r2n2(rs: np.ndarray, ts: np.ndarray, mean: np.ndarray,
                     std: float) -> PerspectiveCamera:
    """Build the normalized-space camera for one R2N2 view
    (`shapenet_r2n2.py:65-95`): fold the dataset-global point normalization
    (x_norm = (x - mean)/std) into R/T, flip x/y for PyTorch3D screen
    convention, focal 2.1875.

    Args:
        rs: (3, 3) rotation from `compute_camera_calibration`.
        ts: (3,) translation.
        mean: (3,) dataset-global point mean.
        std: scalar dataset-global std.

    Returns:
        A single-camera `PerspectiveCamera` with leading batch dim 1.
    """
    pose = np.concatenate([np.asarray(rs), np.asarray(ts)[None]], axis=0)
    extrin = np.concatenate(
        [pose, np.array([[0.0, 0.0, 0.0, 1.0]]).T], axis=1)  # (4, 4)
    shapenet_to_pytorch3d = np.diag([-1.0, -1.0, 1.0, 1.0])
    rt = extrin @ shapenet_to_pytorch3d
    r = rt[:3, :3].copy()
    camera_r = r * std
    t = rt[3, :3].copy()
    camera_t = np.asarray(mean) @ r / std + t
    camera_r[:, :2] *= -1
    camera_t[:2] *= -1
    return PerspectiveCamera(
        R=jnp.asarray(camera_r, dtype=jnp.float32)[None],
        T=jnp.asarray(camera_t, dtype=jnp.float32)[None],
        focal_length=jnp.full((1, 2), R2N2_FOCAL, dtype=jnp.float32),
        principal_point=jnp.zeros((1, 2), dtype=jnp.float32),
    )


def compute_camera_calibration(rt: np.ndarray):
    """Split a ShapeNet world-to-camera RT into PyTorch3D R, T
    (`dataset/utils.py:87-114`)."""
    shapenet_to_pytorch3d = np.diag([-1.0, 1.0, -1.0, 1.0])
    rt = rt.T @ shapenet_to_pytorch3d
    return rt[:3, :3], rt[3, :3]


def stack_cameras(cameras: list[PerspectiveCamera]) -> PerspectiveCamera:
    """Concatenate single-view cameras into one batched camera."""
    return PerspectiveCamera(
        R=jnp.concatenate([c.R for c in cameras], axis=0),
        T=jnp.concatenate([c.T for c in cameras], axis=0),
        focal_length=jnp.concatenate([c.focal_length for c in cameras], 0),
        principal_point=jnp.concatenate(
            [c.principal_point for c in cameras], 0),
    )
