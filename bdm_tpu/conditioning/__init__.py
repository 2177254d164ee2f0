"""Projection conditioning: cameras + rasterized feature lifting.

Replaces the reference's PyTorch3D dependency (`PointsRasterizer` in
`model/projection_model.py:127-157` and `PerspectiveCameras` construction in
`dataset/shapenet_r2n2.py:65-95`) with explicit camera math and a
z-buffer scatter-min projection, all jittable.
"""

from bdm_tpu.conditioning.cameras import (
    PerspectiveCamera,
    camera_from_r2n2,
    compute_extrinsic_matrix,
)
from bdm_tpu.conditioning.projection import surface_projection

__all__ = [
    "PerspectiveCamera",
    "camera_from_r2n2",
    "compute_extrinsic_matrix",
    "surface_projection",
]
