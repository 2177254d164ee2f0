"""PVCNN2: the PointNet++-with-voxel-convs U-Net used by PC2, PVD, and the
BDM-Merging fusion towers.

Block specs and builder control-flow replicate the reference exactly:
  * specs        — `model/pvcnn/pvcnn.py:131-142` (same in
                   `pvd/__init__.py:301-312`)
  * SA builder   — `model/pvcnn/pvcnn_utils.py:72-127`: stage 0 gets ALL its
                   PVConvs; later stages get only the first PVConv (with
                   +embed_dim input channels); attention on odd stages'
                   first conv; the final stage's SA module sees
                   features+temb concatenated (k==0 path).
  * FP builder   — `pvcnn_utils.py:130-168`: every FP stage is one
                   PointNetFPModule followed by all its PVConvs; NO
                   attention (the reference's `c < len(fp_blocks) - 1`
                   check reads the shadowed local list, so it is always
                   False — replicated here as a fixed False).
  * forward      — `pvcnn.py:78-127`.

Layout: channel-last. `inputs` is (B, N, 3 + S); outputs (B, N, out).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bdm_tpu import ops
from bdm_tpu.models.layers import (
    SE,
    Attention,
    SharedMLP,
    TimestepMLP,
    get_timestep_embedding,
    swish,
)


def _barrier(x):
    """Fusion break on the voxel-branch conv boundaries (see the call
    sites: XLA's conv+GN layout mega-fusion ran ~3.5x slower than the
    split kernels). Removing them re-measured a LOSS (r5 TPU A/B:
    30.2 vs 28.6 ms/step) even with every production conv a Pallas
    custom call — the barriers stay."""
    return jax.lax.optimization_barrier(x)


# (conv_configs, sa_configs) per stage; conv = (out_ch, num_blocks, voxel_res),
# sa = (num_centers, radius, num_neighbors, mlp_channels)
PVCNN_SA_BLOCKS = (
    ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
    ((64, 3, 16), (256, 0.2, 32, (64, 128))),
    ((128, 3, 8), (64, 0.4, 32, (128, 256))),
    (None, (16, 0.8, 32, (256, 256, 512))),
)
# (fp_mlp_channels, conv_configs) per stage
PVCNN_FP_BLOCKS = (
    ((256, 256), (256, 3, 8)),
    ((256, 256), (256, 3, 8)),
    ((256, 128), (128, 2, 16)),
    ((128, 128, 64), (64, 2, 32)),
)


# --------------------------------------------------------------------- specs

@dataclass(frozen=True)
class ConvSpec:
    out_channels: int
    resolution: int
    attention: bool


@dataclass(frozen=True)
class SASpec:
    num_centers: Optional[int]  # None -> global A-module
    radius: float
    num_neighbors: int
    mlp: Tuple[int, ...]


@dataclass(frozen=True)
class SAStageSpec:
    convs: Tuple[ConvSpec, ...]
    sa: SASpec
    out_channels: int


@dataclass(frozen=True)
class FPStageSpec:
    fp_mlp: Tuple[int, ...]
    convs: Tuple[ConvSpec, ...]


@dataclass(frozen=True)
class PVCNN2Specs:
    sa_stages: Tuple[SAStageSpec, ...]
    fp_stages: Tuple[FPStageSpec, ...]
    sa_in_channels: Tuple[int, ...]  # feature width entering each SA stage
    channels_sa_features: int


def build_pvcnn2_specs(sa_blocks=PVCNN_SA_BLOCKS, fp_blocks=PVCNN_FP_BLOCKS,
                       extra_feature_channels: int = 3, use_att: bool = True,
                       width_multiplier: int = 1,
                       voxel_resolution_multiplier: int = 1) -> PVCNN2Specs:
    """Replicates `create_pointnet2_sa_components` / `_fp_modules` channel
    accounting (`pvcnn_utils.py:72-168`)."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    in_channels = extra_feature_channels + 3

    sa_stages, sa_in_channels = [], []
    c = 0
    for conv_configs, sa_configs in sa_blocks:
        sa_in_channels.append(in_channels)
        convs = []
        if conv_configs is not None:
            out_ch, num_blocks, res = conv_configs
            out_ch = int(r * out_ch)
            for p in range(num_blocks):
                attention = ((c + 1) % 2 == 0) and use_att and p == 0
                if c == 0 or p == 0:  # stage 0 keeps all convs; others first only
                    convs.append(ConvSpec(out_ch, int(vr * res), attention))
                in_channels = out_ch
        num_centers, radius, num_neighbors, mlp = sa_configs
        mlp = tuple(int(r * oc) for oc in mlp)
        sa_stages.append(SAStageSpec(
            convs=tuple(convs),
            sa=SASpec(num_centers, radius, num_neighbors, mlp),
            out_channels=mlp[-1],
        ))
        in_channels = mlp[-1]
        c += 1

    sa_in_channels[0] = extra_feature_channels
    channels_sa_features = in_channels

    fp_stages = []
    for fp_mlp, conv_configs in fp_blocks:
        fp_mlp = tuple(int(r * oc) for oc in fp_mlp)
        convs = []
        if conv_configs is not None:
            out_ch, num_blocks, res = conv_configs
            out_ch = int(r * out_ch)
            # NOTE: attention is always False here; see module docstring.
            convs.extend(ConvSpec(out_ch, int(vr * res), False)
                         for _ in range(num_blocks))
        fp_stages.append(FPStageSpec(fp_mlp=fp_mlp, convs=tuple(convs)))

    return PVCNN2Specs(
        sa_stages=tuple(sa_stages),
        fp_stages=tuple(fp_stages),
        sa_in_channels=tuple(sa_in_channels),
        channels_sa_features=channels_sa_features,
    )


# ------------------------------------------------------------------- modules

class VoxConv(nn.Module):
    """3x3x3 SAME voxel convolution with nn.Conv's exact parameter layout
    ({kernel: (3,3,3,Cin,Cout), bias: (Cout,)} — checkpoint-compatible).

    On TPU dispatches to the Pallas multi-slice conv (`conv3d_ms`,
    `ops/pallas/conv3d.py`) for Cin <= 256 (conv family 6.7 -> 3.5
    ms/step vs the per-slab im2col kernel; XLA's conv builds
    layout-hostile fusions in-graph) and to the matmul-first `conv3d_mm`
    for wider inputs (the 390-channel stage-0). Same bf16-input
    precision as XLA's default f32 conv on this MXU. BDM_CONV_IMPL
    selects slab/ms/xla for A/B runs.

    Pre-contracted mode (`pre_tap`): the per-point tap values
    `rest @ W_t[3:]` were computed once per sample by contracting the
    conditioning map with this conv's tap weights (conv-after-voxelize
    commutes with the per-point linear map — see
    `samplers/pc2.py::precontract_taps`). The conv then reduces to the
    x_t tap contraction + a 27*Cout-channel scatter-mean + a shift-sum —
    no wide conv per step. `in_channels` must then name the full input
    width so the parameter tree stays checkpoint-identical.
    """

    features: int
    dtype: Any = None
    in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None, *,
                 pre_tap: Optional[jnp.ndarray] = None,
                 xt: Optional[jnp.ndarray] = None,
                 vox_ctx=None, resolution: Optional[int] = None,
                 prepadded: bool = False,
                 force_xla: bool = False) -> jnp.ndarray:
        cin = x.shape[-1] if x is not None else self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if prepadded:
            # (B, R+2, HW, Cin) fused-scatter layout, consumed without a
            # pad pass: multi-slice kernel for narrow Cin (the K=3*Cin
            # contraction fills the systolic depth), matmul-first for
            # wide Cin (the 390-ch stage-0 conv)
            r = resolution or x.shape[1] - 2
            if (cin <= 256 and r % 2 == 0
                    and os.environ.get("BDM_CONV_IMPL", "ms") == "ms"):
                from bdm_tpu.ops.pallas.conv3d import conv3d_ms_prepadded
                return conv3d_ms_prepadded(x, kernel, bias, r)
            from bdm_tpu.ops.pallas.conv3d import conv3d_mm_prepadded
            return conv3d_mm_prepadded(x, kernel, bias, r)
        if pre_tap is not None:
            from bdm_tpu.ops.conv_wide import tap_shift_sum
            from bdm_tpu.ops.voxelize import scatter_mean_contributions
            f = self.features
            # x_t taps: (3, 27*Cout), tap-major in (kd, kh, kw) C-order —
            # the same layout precontract_taps builds for the rest rows
            wxt = (kernel[..., :3, :].reshape(27, 3, f)
                   .transpose(1, 0, 2).reshape(3, 27 * f))
            tap = pre_tap + jnp.matmul(
                xt.astype(pre_tap.dtype), wxt.astype(pre_tap.dtype))
            r3 = resolution ** 3
            # pre-divided scatter (counts via sorted-run lengths): the
            # grid is already the MEAN contribution, so the only grid
            # pass is the pure 27-tap shift-sum
            grid = scatter_mean_contributions(tap, vox_ctx, r3).reshape(
                (tap.shape[0],) + (resolution,) * 3 + (27 * f,))
            out = tap_shift_sum(grid, f)
            return (out + bias.astype(jnp.float32)).astype(
                self.dtype or jnp.float32)
        r = x.shape[1]
        from bdm_tpu.ops.voxelize import _use_pallas_scatter
        # force_xla: the sequence-parallel path runs the grid convs as
        # plain lax.conv under GSPMD (Pallas custom calls need shard_map
        # or replication annotations the SP jit does not provide)
        impl = "xla" if force_xla else os.environ.get("BDM_CONV_IMPL", "ms")
        if (impl != "xla" and _use_pallas_scatter() and cin <= 256
                and r >= 2 and x.shape[1:4] == (r, r, r)):
            # dtype-preserving: PVConv feeds bf16 (cast fused upstream of
            # the barrier); output bf16, consumer GN computes f32 stats
            if impl == "ms":
                # multi-slice kernel: beats per-slab by ~20% at R=32
                # small C (TPU A/B, tools/experiment_conv_ms.py)
                from bdm_tpu.ops.pallas.conv3d import conv3d_ms
                return conv3d_ms(x, kernel, bias, r)
            from bdm_tpu.ops.pallas.conv3d import conv3d
            return conv3d(x, kernel, bias, r)
        if (not force_xla and _use_pallas_scatter() and cin > 256
                and r >= 2 and x.shape[1:4] == (r, r, r)):
            # wide inputs (the 390-ch stage-0 conv): matmul-first Pallas
            # kernel — XLA's conv runs tap-blocked from HBM here
            # (4.8 ms), im2col is col-build-bound at this width, and the
            # XLA-level matmul+shift-sum keeps getting pattern-matched
            # into layout-hostile convolution fusions (measured 4.3 vs
            # 6.6 ms)
            from bdm_tpu.ops.pallas.conv3d import conv3d_mm
            return conv3d_mm(x, kernel, bias, r)
        dt = self.dtype or x.dtype
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (1, 1, 1), "SAME",
            dimension_numbers=dn)
        return y + bias.astype(dt)


class PVConv(nn.Module):
    """Point-voxel convolution (`modules/pvconv.py:65-97`): voxelize ->
    [Conv3d k3 -> GN(8) -> Swish -> Dropout -> Conv3d k3 -> GN(8) ->
    (Attention | Swish) -> SE] -> trilinear devoxelize, plus a pointwise
    SharedMLP branch, summed."""

    out_channels: int
    resolution: int
    attention: bool = False
    dropout: float = 0.1
    with_se: bool = True
    with_se_relu: bool = True
    normalize: bool = True
    eps: float = 0.0
    dtype: Any = None  # compute dtype (params stay f32)
    # sequence-parallel mode (SURVEY.md §2.7 large-N path): when a mesh is
    # set and this level's point count clears sp_min_points, the
    # point<->voxel boundary runs point-sharded via shard_map (sharded
    # scatter partials + one grid psum; per-shard devox gather) while the
    # replicated-grid conv stack and the pointwise branch partition under
    # GSPMD. Same params, same math — tested bit-close to the unsharded
    # forward on the 8-device CPU mesh (tests/test_point_sharded.py).
    sp_mesh: Any = None
    sp_min_points: int = 2048

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 deterministic: bool = True, vox_ctx=None,
                 pre_tap: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from bdm_tpu.parallel.point_sharded import sp_active
        sp = sp_active(self.sp_mesh, features.shape[1],
                       self.sp_min_points) and pre_tap is None
        # the voxel context (normalize + sort + counts) is feature-free and
        # shared by every PVConv of a stage when provided by the caller
        if vox_ctx is None and not sp:
            vox_ctx = ops.make_voxel_context(coords, self.resolution,
                                             self.normalize, self.eps)
        from bdm_tpu.ops.voxelize import _use_pallas_scatter
        on_tpu = _use_pallas_scatter() and not sp

        def to_vox_dtype(x):
            # bf16 grid intermediates on the TPU path: the cast sits
            # BEFORE the optimization barrier so it fuses into the
            # producing fusion (a standalone cast+pad pass cost 1.7 ms)
            return x.astype(jnp.bfloat16) if on_tpu else x

        norm_coords = None if sp else vox_ctx.norm_coords

        if sp:
            # point-sharded voxel boundary: sharded scatter partials +
            # one psum build the replicated grid; the conv stack below
            # runs replicated (XLA convs — see VoxConv force_xla)
            from bdm_tpu.parallel.point_sharded import (
                voxel_grid_point_sharded)
            grid, norm_coords = voxel_grid_point_sharded(
                features, coords, self.resolution, self.sp_mesh,
                normalize=self.normalize, eps=self.eps)
            g = _barrier(to_vox_dtype(grid))
            g = VoxConv(self.out_channels, dtype=self.dtype,
                        name="vconv0")(g, force_xla=True)
        elif pre_tap is not None:
            # pre-contracted conditioning: skip the wide voxelize+conv —
            # scatter the per-point tap values and shift-sum instead
            g = VoxConv(self.out_channels, dtype=self.dtype,
                        in_channels=features.shape[-1], name="vconv0")(
                None, pre_tap=pre_tap, xt=features[..., :3],
                vox_ctx=vox_ctx, resolution=self.resolution)
            g = to_vox_dtype(g)
        elif on_tpu and features.shape[-1] > 256:
            # wide stage-0 input: ONE Pallas kernel scatters the
            # pre-divided contributions directly into the D-padded bf16
            # conv layout (the standalone scatter -> cast -> pad chain
            # cost 2.0 + 1.2 + 0.8 ms/step at C=390, profiled r3)
            gp = ops.avg_voxelize_padded_ctx(features, vox_ctx,
                                             self.resolution)
            gp = _barrier(gp)
            g = VoxConv(self.out_channels, dtype=self.dtype,
                        name="vconv0")(gp, prepadded=True,
                                       resolution=self.resolution)
        else:
            if (on_tpu and self.resolution % 2 == 0
                    and os.environ.get("BDM_CONV_IMPL", "ms") == "ms"):
                # narrow branches ride the same fused scatter ->
                # D-padded bf16 conv layout as stage-0: one Pallas
                # kernel replaces the scatter + f32->bf16 convert (+ the
                # conv's pad pass) chain — profiled 0.64 + 0.18 ms per
                # branch at C=64/R=32 before the fusion
                gp = ops.avg_voxelize_padded_ctx(features, vox_ctx,
                                                 self.resolution)
                gp = _barrier(gp)
                g = VoxConv(self.out_channels, dtype=self.dtype,
                            name="vconv0")(gp, prepadded=True,
                                           resolution=self.resolution)
            else:
                g = ops.avg_voxelize_ctx(features, vox_ctx,
                                         self.resolution)
                g = to_vox_dtype(g)

                # fusion breaks: XLA otherwise builds a conv+GN-stats
                # mega-fusion whose layout runs the R=32 conv+GN ~3.5x
                # slower than the split kernels (profiled 6.1 ms
                # in-graph vs 1.8 ms isolated); barriers on the conv
                # boundaries reproduce the isolated compilation
                g = _barrier(g)
                g = VoxConv(self.out_channels, dtype=self.dtype,
                            name="vconv0")(g)
        g = _barrier(g)
        g = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                         name="vnorm0")(g)
        g = swish(g)
        g = nn.Dropout(self.dropout, name="vdrop")(
            g, deterministic=deterministic)
        g = to_vox_dtype(g)
        g = _barrier(g)
        g = VoxConv(self.out_channels, dtype=self.dtype,
                    name="vconv1")(g, force_xla=sp)
        g = _barrier(g)
        g = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                         name="vnorm1")(g)
        if self.attention:
            b, x, y, z, ch = g.shape
            g = Attention(num_groups=8, dtype=self.dtype, name="vatt")(
                g.reshape(b, x * y * z, ch)).reshape(b, x, y, z, ch)
        else:
            g = swish(g)
        if self.with_se:
            # the per-channel SE gate commutes with the linear trilinear
            # devoxelization -> apply it to the (B, N, C) points and skip
            # a full grid read+write pass
            se_scale = SE(use_relu=self.with_se_relu, dtype=self.dtype,
                          return_scale=True, name="se")(g)
        else:
            se_scale = None

        # bf16 grid for the devox gather (the cast fuses into the
        # producing GN/swish fusion; halves the gather's reads)
        g = to_vox_dtype(g)
        acc_dt = self.dtype or jnp.float32
        if sp:
            from bdm_tpu.parallel.point_sharded import (
                devoxelize_point_sharded)
            voxel_features = devoxelize_point_sharded(
                g, norm_coords, self.sp_mesh).astype(acc_dt)
        else:
            voxel_features = ops.trilinear_devoxelize(
                g, norm_coords).astype(acc_dt)
        if se_scale is not None:
            voxel_features = voxel_features * se_scale[:, None, :].astype(
                acc_dt)
        point_features = SharedMLP((self.out_channels,), dtype=self.dtype,
                                   name="point_features")(features)
        return voxel_features + point_features.astype(acc_dt)


class PointNetSAModule(nn.Module):
    """Set abstraction (`modules/pointnet.py:49-93`): FPS centers ->
    ball-query grouping (relative coords concat) -> SharedMLP -> max-pool.

    The reference also groups and max-pools the timestep embedding
    (`pointnet.py:85-90`); since temb is constant across a sample's points,
    that is exactly the identity, so here temb is carried as (B, E) and
    never grouped (mathematically identical, saves a (B,M,U,E) gather)."""

    num_centers: int
    radius: float
    num_neighbors: int
    mlp: Sequence[int]
    include_coordinates: bool = True
    dtype: Any = None
    sp_mesh: Any = None          # see PVConv.sp_mesh
    sp_min_points: int = 2048

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 temb: jnp.ndarray):
        from bdm_tpu.parallel.point_sharded import sp_active
        sp = sp_active(self.sp_mesh, coords.shape[1], self.sp_min_points)
        if sp:
            # point-sharded geometry (bit-identical collectives:
            # parallel/point_sharded.py); the downsampled outputs
            # (M <= 1024 centers) come back replicated
            from bdm_tpu.parallel.point_sharded import (
                ball_query_point_sharded, fps_point_sharded,
                gather_point_sharded, grouping_point_sharded)
            idx = fps_point_sharded(coords, self.num_centers, self.sp_mesh)
            centers = gather_point_sharded(coords, idx, self.sp_mesh)
            nbr = ball_query_point_sharded(
                centers, coords, self.radius, self.num_neighbors,
                self.sp_mesh)
        else:
            idx = ops.furthest_point_sample(coords, self.num_centers)
            centers = ops.gather(coords, idx)                  # (B, M, 3)
            nbr = ops.ball_query(centers, coords, self.radius,
                                 self.num_neighbors)           # (B, M, U)
        acc_dt = self.dtype or jnp.float32

        def group(x):
            if sp:
                return grouping_point_sharded(x, nbr, self.sp_mesh)
            return ops.grouping(x, nbr)

        if self.include_coordinates:
            # ONE gather of [coords | features]: a separate 3-channel
            # coords gather wastes 97% of every lane row (profiled 1.5 ms
            # at stage 0 vs ~0 marginal cost on the feature gather).
            # Under bf16 the rel-coords ride as bf16 too — they are MLP
            # inputs from here on, not geometry (FPS/ball query above
            # consumed the f32 coords).
            both = group(
                jnp.concatenate([coords.astype(acc_dt),
                                 features.astype(acc_dt)], axis=-1))
            nbr_feats = jnp.concatenate(
                [both[..., :3] - centers[:, :, None, :].astype(acc_dt),
                 both[..., 3:]], axis=-1)
        else:
            nbr_feats = group(features)
        f = SharedMLP(tuple(self.mlp), dtype=self.dtype,
                      name="mlp")(nbr_feats)              # (B, M, U, C)
        f = f.max(axis=2).astype(acc_dt)
        return f, centers, temb


class PointNetAModule(nn.Module):
    """Global set abstraction (`modules/pointnet.py:11-46`): MLP then
    max-pool all points to a single center at the origin. Unused by the BDM
    block specs but part of the op surface."""

    mlp: Sequence[int]
    include_coordinates: bool = True

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 temb: jnp.ndarray):
        if self.include_coordinates:
            features = jnp.concatenate([features, coords], axis=-1)
        f = SharedMLP(tuple(self.mlp), name="mlp")(features)
        f = f.max(axis=1, keepdims=True)                       # (B, 1, C)
        centers = jnp.zeros((coords.shape[0], 1, 3), coords.dtype)
        return f, centers, temb


class PointNetFPModule(nn.Module):
    """Feature propagation (`modules/pointnet.py:96-113`): 3-NN interpolate
    coarse features to the fine points, concat the (per-sample constant)
    temb and skip features, SharedMLP.

    The reference interpolates temb too; IDW weights sum to 1, so that is
    the identity on a constant — temb stays (B, E) and is broadcast into
    the mlp input at the same channel position as the reference's layout
    [interp(features) | temb | skip]."""

    mlp: Sequence[int]
    dtype: Any = None
    sp_mesh: Any = None          # see PVConv.sp_mesh
    sp_min_points: int = 2048

    @nn.compact
    def __call__(self, fine_coords: jnp.ndarray, coarse_coords: jnp.ndarray,
                 coarse_features: jnp.ndarray,
                 skip_features: Optional[jnp.ndarray],
                 temb: jnp.ndarray):
        from bdm_tpu.parallel.point_sharded import sp_active
        acc_dt = self.dtype or jnp.float32
        if sp_active(self.sp_mesh, fine_coords.shape[1],
                     self.sp_min_points):
            # query axis sharded, centers replicated: fully local upsample
            from bdm_tpu.parallel.point_sharded import (
                three_nn_interpolate_point_sharded)
            f = three_nn_interpolate_point_sharded(
                fine_coords, coarse_coords, coarse_features, self.sp_mesh)
        else:
            f = ops.three_nn_interpolate(fine_coords, coarse_coords,
                                         coarse_features)
        n = fine_coords.shape[1]
        # cast every part to the compute dtype BEFORE the concat so the
        # materialized (B, N, C) buffer rides at half width under bf16
        parts = [f.astype(acc_dt),
                 jnp.broadcast_to(temb[:, None, :].astype(acc_dt),
                                  (temb.shape[0], n, temb.shape[-1]))]
        if skip_features is not None and skip_features.shape[-1] > 0:
            parts.append(skip_features.astype(acc_dt))
        f = jnp.concatenate(parts, axis=-1)
        f = SharedMLP(tuple(self.mlp), dtype=self.dtype, name="mlp")(f)
        return f.astype(acc_dt), fine_coords, temb


# -------------------------------------------------------- encoder / decoder

class PVCNNEncoder(nn.Module):
    """The SA tower + optional global attention (`pvcnn.py:94-110`).

    Returns the bottleneck (features, coords, temb) and the per-stage skip
    lists needed by the decoder.
    """

    specs: PVCNN2Specs
    use_att: bool = True
    dropout: float = 0.1
    dtype: Any = None
    sp_mesh: Any = None          # see PVConv.sp_mesh
    sp_min_points: int = 2048

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 temb: jnp.ndarray, deterministic: bool = True,
                 pre_tap: Optional[jnp.ndarray] = None):
        """temb: (B, E) per-sample embedding (constant over points; see
        PointNetSAModule docstring), broadcast at each concat site.
        pre_tap: optional pre-contracted conditioning taps for stage 0's
        first PVConv (see VoxConv)."""
        from bdm_tpu.parallel.point_sharded import sp_active
        sp_kw = dict(sp_mesh=self.sp_mesh, sp_min_points=self.sp_min_points)
        coords_list, in_features_list = [], []
        for i, stage in enumerate(self.specs.sa_stages):
            in_features_list.append(features)
            coords_list.append(coords)
            acc_dt = self.dtype or jnp.float32
            if i == 0:
                f = features
            else:
                n = features.shape[1]
                f = jnp.concatenate(
                    [features.astype(acc_dt),
                     jnp.broadcast_to(temb[:, None, :].astype(acc_dt),
                                      (temb.shape[0], n, temb.shape[-1]))],
                    axis=-1)
            stage_sp = sp_active(self.sp_mesh, coords.shape[1],
                                 self.sp_min_points)
            vox_ctx = (ops.make_voxel_context(coords,
                                              stage.convs[0].resolution)
                       if stage.convs and not stage_sp else None)
            for p, cs in enumerate(stage.convs):
                f = PVConv(cs.out_channels, cs.resolution, cs.attention,
                           dropout=self.dropout, dtype=self.dtype,
                           name=f"sa{i}_conv{p}", **sp_kw)(
                    f, coords, deterministic, vox_ctx,
                    pre_tap=pre_tap if (i == 0 and p == 0) else None)
            sa = stage.sa
            if sa.num_centers is None:
                f, coords, temb = PointNetAModule(
                    mlp=sa.mlp, name=f"sa{i}_pool")(f, coords, temb)
            else:
                # final stage (no convs, i>0): its SA consumes features+temb
                # (builder k==0 path, `pvcnn_utils.py:118`)
                f, coords, temb = PointNetSAModule(
                    num_centers=sa.num_centers, radius=sa.radius,
                    num_neighbors=sa.num_neighbors, mlp=sa.mlp,
                    dtype=self.dtype, name=f"sa{i}_pool", **sp_kw)(
                    f, coords, temb)
            features = f
        if self.use_att:
            features = Attention(num_groups=8, dtype=self.dtype,
                                 name="global_att")(features)
            features = features.astype(self.dtype or jnp.float32)
        return features, coords, temb, coords_list, in_features_list


class PVCNNDecoder(nn.Module):
    """The FP tower + classifier head (`pvcnn.py:112-127`)."""

    specs: PVCNN2Specs
    out_channels: int
    dropout: float = 0.1
    classifier_init_scale: Optional[float] = 1e-6
    dtype: Any = None
    sp_mesh: Any = None          # see PVConv.sp_mesh
    sp_min_points: int = 2048

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 temb: jnp.ndarray, coords_list, skip_list,
                 deterministic: bool = True):
        from bdm_tpu.parallel.point_sharded import sp_active
        sp_kw = dict(sp_mesh=self.sp_mesh, sp_min_points=self.sp_min_points)
        for fp_idx, stage in enumerate(self.specs.fp_stages):
            fine_coords = coords_list[-1 - fp_idx]
            skip = skip_list[-1 - fp_idx]
            features, coords, temb = PointNetFPModule(
                mlp=stage.fp_mlp, dtype=self.dtype,
                name=f"fp{fp_idx}_mlp", **sp_kw)(
                fine_coords, coords, features, skip, temb)
            stage_sp = sp_active(self.sp_mesh, coords.shape[1],
                                 self.sp_min_points)
            vox_ctx = (ops.make_voxel_context(coords,
                                              stage.convs[0].resolution)
                       if stage.convs and not stage_sp else None)
            for p, cs in enumerate(stage.convs):
                features = PVConv(
                    cs.out_channels, cs.resolution, cs.attention,
                    dropout=self.dropout, dtype=self.dtype,
                    name=f"fp{fp_idx}_conv{p}", **sp_kw)(
                    features, coords, deterministic, vox_ctx)

        # classifier: SharedMLP(128) -> Dropout -> Dense(out)
        # (`pvcnn_utils.py:13-43` with out_channels=[128, dropout, out])
        f = SharedMLP((128,), dtype=self.dtype,
                      name="classifier_mlp")(features)
        f = f.astype(jnp.float32)
        f = nn.Dropout(self.dropout, name="classifier_drop")(
            f, deterministic=deterministic)
        if self.classifier_init_scale is not None:
            init = nn.initializers.normal(self.classifier_init_scale)
            out = nn.Dense(self.out_channels, kernel_init=init,
                           bias_init=init, name="classifier_out")(f)
        else:
            out = nn.Dense(self.out_channels, name="classifier_out")(f)
        return out


class PVCNN2(nn.Module):
    """The full noise-prediction backbone (`pvcnn.py:10-150`).

    __call__(inputs (B, N, 3+S), t (B,)) -> (B, N, out_channels).
    Coordinates are the first 3 channels of `inputs`; the skip features at
    the finest level are `inputs[..., 3:]` (`pvcnn.py:106`).
    """

    out_channels: int = 3
    embed_dim: int = 64
    extra_feature_channels: int = 3
    use_att: bool = True
    dropout: float = 0.1
    width_multiplier: int = 1
    voxel_resolution_multiplier: int = 1
    sa_blocks: tuple = PVCNN_SA_BLOCKS
    fp_blocks: tuple = PVCNN_FP_BLOCKS
    # PC2 re-initializes the classifier head to N(0, 1e-6^2)
    # (`point_cloud_model.py:38-39`); PVD keeps the default init.
    classifier_init_scale: Optional[float] = 1e-6
    # compute dtype: None/f32 for parity; jnp.bfloat16 trades ~1e-2 relative
    # activation error for ~2x MXU/HBM throughput (geometry ops stay f32)
    dtype: Any = None
    # sequence-parallel mode (SURVEY.md §2.7): shard the point axis of
    # every level with >= sp_min_points points over the "sp" axis of this
    # mesh. Geometry ops (FPS/ball query/grouping/scatter/devox) run as
    # bit-identical shard_map collectives (parallel/point_sharded.py);
    # dense compute (SharedMLPs, grid convs, GroupNorms) partitions under
    # GSPMD, which inserts the cross-shard stat reductions automatically.
    sp_mesh: Any = None
    sp_min_points: int = 2048

    def specs(self) -> PVCNN2Specs:
        return build_pvcnn2_specs(
            self.sa_blocks, self.fp_blocks, self.extra_feature_channels,
            self.use_att, self.width_multiplier,
            self.voxel_resolution_multiplier)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, t: jnp.ndarray,
                 deterministic: bool = True,
                 pre_tap: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        specs = self.specs()

        temb = get_timestep_embedding(self.embed_dim, t)
        temb = TimestepMLP(self.embed_dim, name="embedf")(temb)  # (B, E)

        # geometry (FPS / ball query / voxel ids) always reads f32 coords;
        # under bf16 only the FEATURE stream is narrowed
        coords = inputs[..., :3].astype(jnp.float32)
        features = inputs if self.dtype is None else inputs.astype(self.dtype)

        sp_kw = dict(sp_mesh=self.sp_mesh, sp_min_points=self.sp_min_points)
        feats, ccoords, ctemb, coords_list, skip_list = PVCNNEncoder(
            specs=specs, use_att=self.use_att, dropout=self.dropout,
            dtype=self.dtype, name="encoder", **sp_kw)(
            features, coords, temb, deterministic, pre_tap=pre_tap)
        skip_list[0] = inputs[..., 3:]

        return PVCNNDecoder(
            specs=specs, out_channels=self.out_channels, dropout=self.dropout,
            classifier_init_scale=self.classifier_init_scale,
            dtype=self.dtype, name="decoder", **sp_kw)(
            feats, ccoords, ctemb, coords_list, skip_list, deterministic)
