"""PVCNNFuse — the BDM-Merging fusion network.

Reference: `experiments/model/pvcnn/pvcnn_fuse.py:14-277`. Two frozen PVCNN2
encoder towers (the PC2 recon encoder over the conditioned input, and the
PVD prior encoder over bare coordinates) are fused per-scale into a
trainable copy of the PC2 decoder through zero-initialized ControlNet-style
projections, so at initialization the fusion net is exactly the PC2 model.

Modes (`pvcnn_fuse.py:149-154`):
  * 'fusion_nstep' — the PVD tower consumes the PRIOR branch's point cloud.
  * 'fusion_1step' — the PVD tower consumes the recon coords (training).

Known deviation from the reference: the reference feeds the PVD tower (and
the decoder) the timestep embedding ALREADY downsampled by the PC2 tower to
16 centers, whose subsequent ball-query gather indexes out of bounds on
CUDA (reads arbitrary memory, `pvcnn_fuse.py:140-196`). We feed the PVD
tower a fresh full-resolution embedding and give the decoder the PC2
tower's embedding — the well-defined semantics the code intends.

Parameter partition for training (`model/__init__.py:27-35`): freeze
'pc2_encoder' and 'pvd_encoder'; train 'decoder', 'embedf', 'proj*'.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from bdm_tpu.models.layers import TimestepMLP, get_timestep_embedding
from bdm_tpu.models.pvcnn import (
    PVCNN_FP_BLOCKS,
    PVCNN_SA_BLOCKS,
    PVCNNDecoder,
    PVCNNEncoder,
    build_pvcnn2_specs,
)


class ZeroConvProj(nn.Module):
    """Per-scale fusion projection (`pvcnn_fuse.py:111-123`):
    Conv1d -> LeakyReLU(0.02) -> Conv1d -> zero-conv. The first two convs
    use N(0, 2/dim) init with zero bias; the zero-conv starts at zero so the
    fusion net initially equals PC2."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(float(np.sqrt(2.0 / self.dim)))
        x = nn.Dense(self.dim, kernel_init=init, name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.02)
        x = nn.Dense(self.dim, kernel_init=init, name="conv2")(x)
        return nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                        name="zero_conv")(x)


class PVCNNFuse(nn.Module):
    out_channels: int = 3
    embed_dim: int = 64
    extra_feature_channels: int = 3  # of the conditioned recon input
    use_att: bool = True
    dropout: float = 0.1
    width_multiplier: int = 1
    voxel_resolution_multiplier: int = 1
    sa_blocks: tuple = PVCNN_SA_BLOCKS
    fp_blocks: tuple = PVCNN_FP_BLOCKS
    dtype: Any = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, recon_inputs_with_cond: jnp.ndarray,
                 input_from_prior: jnp.ndarray, t: jnp.ndarray,
                 mode: str = "fusion_nstep",
                 deterministic: bool = True) -> jnp.ndarray:
        assert mode in ("fusion_nstep", "fusion_1step"), mode
        pc2_specs = build_pvcnn2_specs(
            self.sa_blocks, self.fp_blocks, self.extra_feature_channels,
            self.use_att, self.width_multiplier,
            self.voxel_resolution_multiplier)
        pvd_specs = build_pvcnn2_specs(
            self.sa_blocks, self.fp_blocks, 0, self.use_att,
            self.width_multiplier, self.voxel_resolution_multiplier)

        temb = get_timestep_embedding(self.embed_dim, t)
        temb = TimestepMLP(self.embed_dim, name="embedf")(temb)  # (B, E)

        # ---- PC2 tower over the conditioned input
        coords_pc2 = recon_inputs_with_cond[..., :3]
        f_pc2, cc_pc2, temb_pc2, coords_list, pc2_skips = PVCNNEncoder(
            specs=pc2_specs, use_att=self.use_att, dropout=self.dropout,
            dtype=self.dtype,
            name="pc2_encoder")(recon_inputs_with_cond, coords_pc2, temb,
                                deterministic)
        pc2_skips[0] = recon_inputs_with_cond[..., 3:]

        # ---- PVD tower over bare coordinates
        if mode == "fusion_nstep":
            coords_pvd = input_from_prior[..., :3]
        else:
            coords_pvd = coords_pc2
        f_pvd, _, _, _, pvd_skips = PVCNNEncoder(
            specs=pvd_specs, use_att=self.use_att, dropout=self.dropout,
            dtype=self.dtype,
            name="pvd_encoder")(coords_pvd, coords_pvd, temb, deterministic)

        # ---- per-scale zero-conv fusion (`pvcnn_fuse.py:203-212`)
        # projs are indexed like the reference's self.projs: one per skip
        # scale (dims 64/128/256) plus the bottleneck (512) as the last.
        skip_dims = [int(x.shape[-1]) for x in pvd_skips[1:]]  # 64, 128, 256
        bottleneck_dim = int(f_pvd.shape[-1])                  # 512
        bneck_name = f"proj{len(skip_dims)}"
        fused = ZeroConvProj(bottleneck_dim, name=bneck_name)(f_pvd) + f_pc2
        fused_skips = [pc2_skips[0]]
        for i, (pc2_s, pvd_s, dim) in enumerate(
                zip(pc2_skips[1:], pvd_skips[1:], skip_dims)):
            fused_skips.append(
                ZeroConvProj(dim, name=f"proj{i}")(pvd_s) + pc2_s)

        # ---- trainable copy of the PC2 decoder over fused features
        return PVCNNDecoder(
            specs=pc2_specs, out_channels=self.out_channels,
            dropout=self.dropout, classifier_init_scale=None,
            dtype=self.dtype,
            name="decoder")(fused, cc_pc2, temb_pc2, coords_list,
                            fused_skips, deterministic)
