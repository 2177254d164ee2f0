"""bdm_tpu — a TPU-native JAX framework for Bayesian Diffusion Models.

A from-scratch rebuild of the capabilities of mlpc-ucsd/BDM ("Bayesian
Diffusion Models for 3D Shape Reconstruction", CVPR 2024) designed for TPU
hardware: jit/pjit + shard_map over device meshes, lax.scan sampling loops,
and Pallas kernels for the scatter/gather-heavy point-cloud ops.

Subpackages
-----------
ops            Point-cloud kernels (voxelize, devoxelize, FPS, ball query,
               grouping, 3-NN interpolation) as pure JAX functions.
diffusion      DDPM/DDIM schedulers and the PVD-style Gaussian diffusion.
models         Flax backbones: PVCNN2 (shared by PC2/PVD/fusion), ViT
               feature extractor, simple point models.
conditioning   Camera math and rasterized surface projection.
samplers       PC2 sampling, interaction windows, BDM blending/merging.
data           ShapeNet-R2N2 / Pix3D loaders and synthetic data.
train          Optimizers, EMA, checkpointing, training loops.
parallel       Mesh construction and sharded train/sample steps.
evaluation     Chamfer / F-score metrics (batched, on-device).
config         Structured config mirroring the reference CLI surface.
"""

__version__ = "0.1.0"
