"""Native (C++) host-side runtime pieces.

The reference's native layer is its CUDA op library, which became Pallas
kernels; on the TPU host the remaining native-worthy path is data loading
(`pointio.cpp`): threaded .npy/.ply point-cloud reading + subsampling that
releases the GIL. Falls back to pure numpy when a compiler is unavailable.
"""

from bdm_tpu.native.pointio import (
    native_available,
    read_points,
    read_many_npy,
)

__all__ = ["native_available", "read_points", "read_many_npy"]
