"""Flax backbones for bdm_tpu.

One parametrized PVCNN2 implementation serves the PC2 recon model, the PVD
prior and both towers of the BDM-Merging fusion net — the reference proves
they share topology (`pvcnn.py:131-142` == `pvd/__init__.py:301-312` ==
`pvcnn_fuse.py:241-252`).
"""

from bdm_tpu.models.pvcnn import PVCNN2, PVCNN_SA_BLOCKS, PVCNN_FP_BLOCKS
from bdm_tpu.models.fusion import PVCNNFuse
from bdm_tpu.models.layers import get_timestep_embedding

__all__ = [
    "PVCNN2",
    "PVCNNFuse",
    "PVCNN_SA_BLOCKS",
    "PVCNN_FP_BLOCKS",
    "get_timestep_embedding",
]
