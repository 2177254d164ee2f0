"""Samplers: PC2 conditional diffusion, the PVD prior, and the coupled
BDM-Blending / BDM-Merging samplers.

All reverse-diffusion loops are `lax.scan`s inside jit; the BDM milestone
structure is a static Python loop over segments (milestone lists are tiny,
<= 8 entries — SURVEY.md section 7 'hard parts' #3).
"""

from bdm_tpu.samplers.pc2 import PC2Model, ProjectionConfig
from bdm_tpu.samplers.pvd import PVDModel
from bdm_tpu.samplers.blending import bdm_blending
from bdm_tpu.samplers.merging import BDMMergingModel, bdm_merging

__all__ = [
    "PC2Model",
    "ProjectionConfig",
    "PVDModel",
    "bdm_blending",
    "BDMMergingModel",
    "bdm_merging",
]
