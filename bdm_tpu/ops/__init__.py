"""Point-cloud ops: the TPU-native equivalents of the reference CUDA library.

The reference (mlpc-ucsd/BDM) ships one CUDA op library in two byte-identical
copies (`experiments/model/pvcnn/modules/functional/src/` and
`experiments/pvd/modules/functional/src/`). Here there is ONE library of pure
JAX functions, differentiable end-to-end, with layouts chosen for TPU
(channel-last, static shapes, no data-dependent control flow).

All functions take channel-LAST arrays:
    points / coords : (B, N, 3) float32
    features        : (B, N, C)
    voxel grids     : (B, R, R, R, C)
"""

from bdm_tpu.ops.voxelize import (
    normalize_coords,
    avg_voxelize,
    avg_voxelize_ctx,
    avg_voxelize_padded_ctx,
    make_voxel_context,
    VoxelContext,
    trilinear_devoxelize,
)
from bdm_tpu.ops.sampling import furthest_point_sample, gather
from bdm_tpu.ops.ball_query import ball_query
from bdm_tpu.ops.grouping import grouping
from bdm_tpu.ops.interpolate import three_nn, three_nn_interpolate

__all__ = [
    "normalize_coords",
    "avg_voxelize",
    "avg_voxelize_ctx",
    "avg_voxelize_padded_ctx",
    "make_voxel_context",
    "VoxelContext",
    "trilinear_devoxelize",
    "furthest_point_sample",
    "gather",
    "ball_query",
    "grouping",
    "three_nn",
    "three_nn_interpolate",
]
