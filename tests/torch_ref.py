"""CPU torch replica of the reference's composed PVCNN2 forwards, for
whole-network parity tests.

Transcribed from the reference builders and modules (channel-first, same
state_dict key structure so `bdm_tpu.utils.convert_torch` applies
directly):
  * builder control flow — `model/pvcnn/pvcnn_utils.py:72-168`
  * PVConv / Attention    — `model/pvcnn/modules/pvconv.py:17-97`
  * SA / A / FP modules   — `model/pvcnn/modules/pointnet.py:11-113`
  * BallQuery grouping    — `model/pvcnn/modules/ball_query.py:16-30`
  * Voxelization          — `model/pvcnn/modules/voxelization.py:16-25`
  * SE3d / SharedMLP      — `modules/se.py:8-19`, `modules/shared_mlp.py:11-38`
  * PC2 forward           — `model/pvcnn/pvcnn.py:78-127`
  * fusion forward        — `model/pvcnn/pvcnn_fuse.py:125-237`

The CUDA geometry ops are replaced by vectorized NumPy implementations of
their documented semantics (the same semantics the repo's jax ops are
golden-tested against in tests/test_ops.py).

One deliberate deviation, shared with bdm_tpu: the reference feeds the
fusion net's PVD tower the timestep embedding already downsampled by the
PC2 tower (B, E, 16), whose neighbor-gather then indexes out of bounds on
CUDA (UB — see bdm_tpu/models/fusion.py docstring). Here the PVD tower
receives a full-resolution embedding; temb is constant along the point
axis, so every in-bounds realization of the reference computes this.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from tests.test_ops import np_fps, np_three_nn


# ---------------------------------------------------------- numpy geometry

def np_ball_query_vec(centers, points, radius, u):
    """Scan-order first-u ball query (`ball_query.cu:19-58`): index 0
    fills all slots, then the first u in-radius points overwrite."""
    m = centers.shape[0]
    out = np.zeros((m, u), dtype=np.int64)
    d2 = ((centers[:, None] - points[None]) ** 2).sum(-1)
    mask = d2 < radius ** 2
    for j in range(m):
        nz = np.nonzero(mask[j])[0]
        if len(nz):
            out[j, :] = nz[0]
            out[j, :min(u, len(nz))] = nz[:u]
    return out


def np_avg_voxelize_vec(features, vox, r):
    """(N, C), (N, 3) int -> (r^3, C) scatter-mean (`vox.cu:48-83`)."""
    ids = vox[:, 0] * r * r + vox[:, 1] * r + vox[:, 2]
    sums = np.zeros((r ** 3, features.shape[1]), np.float32)
    np.add.at(sums, ids, features)
    cnt = np.bincount(ids, minlength=r ** 3).astype(np.float32)
    return sums / np.maximum(cnt, 1.0)[:, None]


def np_trilinear_devox_vec(grid_flat, coords, r):
    """(r^3, C) grid, (N, 3) float coords in [0, r-1] -> (N, C)
    (`trilinear_devox.cu:22-109` incl. the frac>0 corner rule)."""
    lo = np.floor(coords).astype(np.int64)
    fr = (coords - lo).astype(np.float32)
    hi = lo + (fr > 0)
    out = np.zeros((coords.shape[0], grid_flat.shape[1]), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xx = hi[:, 0] if dx else lo[:, 0]
                yy = hi[:, 1] if dy else lo[:, 1]
                zz = hi[:, 2] if dz else lo[:, 2]
                w = ((fr[:, 0] if dx else 1 - fr[:, 0])
                     * (fr[:, 1] if dy else 1 - fr[:, 1])
                     * (fr[:, 2] if dz else 1 - fr[:, 2]))
                out += w[:, None] * grid_flat[xx * r * r + yy * r + zz]
    return out


def _t(fn, *arrays):
    """Run a per-sample numpy fn over a batch of torch tensors."""
    outs = [fn(*[np.asarray(a[i].detach()) for a in arrays])
            for i in range(arrays[0].shape[0])]
    return torch.from_numpy(np.stack(outs))


# ------------------------------------------------------------ torch modules

class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class TSharedMLP(nn.Module):
    """`shared_mlp.py:11-38`: (conv1x1 -> GN(8) -> Swish) x k; tuple inputs
    pass trailing elements through untouched."""

    def __init__(self, in_ch, out_chs, dim=1):
        super().__init__()
        if not isinstance(out_chs, (list, tuple)):
            out_chs = [out_chs]
        conv = nn.Conv1d if dim == 1 else nn.Conv2d
        layers = []
        for oc in out_chs:
            layers.extend([conv(in_ch, oc, 1), nn.GroupNorm(8, oc), Swish()])
            in_ch = oc
        self.layers = nn.Sequential(*layers)

    def forward(self, inputs):
        if isinstance(inputs, (list, tuple)):
            return (self.layers(inputs[0]), *inputs[1:])
        return self.layers(inputs)


class TAttention(nn.Module):
    """`pvconv.py:17-63` — NO 1/sqrt(C) scale; residual + GN + Swish."""

    def __init__(self, ch, num_groups, d=3):
        super().__init__()
        conv = nn.Conv3d if d == 3 else nn.Conv1d
        self.q, self.k, self.v = conv(ch, ch, 1), conv(ch, ch, 1), \
            conv(ch, ch, 1)
        self.out = conv(ch, ch, 1)
        self.norm = nn.GroupNorm(num_groups, ch)

    def forward(self, x):
        b, c = x.shape[:2]
        q = self.q(x).reshape(b, c, -1)
        k = self.k(x).reshape(b, c, -1)
        v = self.v(x).reshape(b, c, -1)
        w = torch.softmax(torch.matmul(q.permute(0, 2, 1), k), dim=-1)
        h = torch.matmul(v, w.permute(0, 2, 1)).reshape(b, c, *x.shape[2:])
        h = self.out(h) + x
        h = self.norm(h)
        return h * torch.sigmoid(h)


class TSE3d(nn.Module):
    """`se.py:8-19` (use_relu variant; no biases)."""

    def __init__(self, ch, reduction=8, use_relu=True):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(ch, ch // reduction, bias=False),
            nn.ReLU() if use_relu else Swish(),
            nn.Linear(ch // reduction, ch, bias=False),
            nn.Sigmoid())

    def forward(self, x):
        s = self.fc(x.mean(-1).mean(-1).mean(-1))
        return x * s.view(x.shape[0], x.shape[1], 1, 1, 1)


class TPVConv(nn.Module):
    """`pvconv.py:65-97` with numpy voxelize/devoxelize."""

    def __init__(self, in_ch, out_ch, resolution, attention=False,
                 dropout=0.1):
        super().__init__()
        self.resolution = resolution
        self.voxel_layers = nn.Sequential(
            nn.Conv3d(in_ch, out_ch, 3, stride=1, padding=1),
            nn.GroupNorm(8, out_ch), Swish(), nn.Dropout(dropout),
            nn.Conv3d(out_ch, out_ch, 3, stride=1, padding=1),
            nn.GroupNorm(8, out_ch),
            TAttention(out_ch, 8) if attention else Swish(),
            TSE3d(out_ch))
        self.point_features = TSharedMLP(in_ch, out_ch)

    def forward(self, inputs):
        features, coords, temb = inputs
        r = self.resolution
        # `voxelization.py:16-25`
        c = coords.detach()
        nc = c - c.mean(2, keepdim=True)
        nc = nc / (nc.norm(dim=1, keepdim=True).max(dim=2, keepdim=True)
                   .values * 2.0) + 0.5
        nc = torch.clamp(nc * r, 0, r - 1)
        vox = torch.round(nc).to(torch.int64)
        feats_last = features.permute(0, 2, 1)                 # (B, N, C)
        grid = _t(lambda f, v: np_avg_voxelize_vec(f, v, r), feats_last,
                  vox.permute(0, 2, 1))                        # (B, r^3, C)
        g = grid.permute(0, 2, 1).reshape(
            features.shape[0], features.shape[1], r, r, r)
        g = self.voxel_layers(g)
        gf = g.reshape(g.shape[0], g.shape[1], -1).permute(0, 2, 1)
        vox_feats = _t(lambda gr, co: np_trilinear_devox_vec(gr, co, r),
                       gf.contiguous(), nc.permute(0, 2, 1).contiguous())
        vox_feats = vox_feats.permute(0, 2, 1)
        return vox_feats + self.point_features(features), coords, temb


class TPointNetSA(nn.Module):
    """`pointnet.py:49-93` + `ball_query.py:16-30` (single-radius form)."""

    def __init__(self, num_centers, radius, num_neighbors, in_ch, out_chs):
        super().__init__()
        self.num_centers, self.radius = num_centers, radius
        self.num_neighbors = num_neighbors
        self.out_channels = out_chs[-1]
        self.mlps = nn.ModuleList([TSharedMLP(in_ch + 3, out_chs, dim=2)])

    def forward(self, inputs):
        features, coords, temb = inputs
        cl = coords.permute(0, 2, 1)                          # (B, N, 3)
        idx = torch.from_numpy(np_fps(np.asarray(cl.detach()),
                                      self.num_centers)).long()
        centers = torch.gather(cl, 1, idx[..., None].expand(-1, -1, 3))
        nbr = _t(lambda ce, pt: np_ball_query_vec(
            ce, pt, self.radius, self.num_neighbors),
            centers, cl).long()                               # (B, M, U)
        b, m, u = nbr.shape

        def group(x_cf):  # (B, C, N) -> (B, C, M, U)
            flat = nbr.reshape(b, 1, m * u).expand(-1, x_cf.shape[1], -1)
            return torch.gather(x_cf, 2, flat).reshape(
                b, x_cf.shape[1], m, u)

        rel = group(coords) - centers.permute(0, 2, 1)[..., None]
        nbr_feats = torch.cat([rel, group(features)], dim=1)
        f, temb_g = self.mlps[0]((nbr_feats, group(temb)))
        return (f.max(dim=-1).values, centers.permute(0, 2, 1),
                temb_g.max(dim=-1).values)


class TPointNetFP(nn.Module):
    """`pointnet.py:96-113`: joint [features|temb] 3-NN interpolation."""

    def __init__(self, in_ch, out_chs):
        super().__init__()
        self.mlp = TSharedMLP(in_ch, out_chs, dim=1)

    def forward(self, inputs):
        fine_coords, coarse_coords, centers_features, skip, temb = inputs

        def interp(x_cf):
            def one(pts, ctr, feats):
                idx, w = np_three_nn(pts[None], ctr[None])
                return (feats[idx[0]] * w[0][..., None]).sum(1)
            out = _t(one, fine_coords.permute(0, 2, 1).contiguous(),
                     coarse_coords.permute(0, 2, 1).contiguous(),
                     x_cf.permute(0, 2, 1).contiguous())
            return out.permute(0, 2, 1)

        f = interp(centers_features)
        if skip is not None and skip.shape[1] > 0:
            f = torch.cat([f, skip], dim=1)
        return self.mlp(f), fine_coords, interp(temb)


# ----------------------------------------------------------------- builders

def build_sa_layers(sa_blocks, extra_feature_channels, embed_dim,
                    dropout=0.1):
    """`create_pointnet2_sa_components` control flow
    (`pvcnn_utils.py:72-127`)."""
    in_channels = extra_feature_channels + 3
    sa_layers, sa_in_channels = [], []
    c = 0
    for conv_configs, sa_configs in sa_blocks:
        k = 0
        sa_in_channels.append(in_channels)
        blocks = []
        if conv_configs is not None:
            out_ch, num_blocks, res = conv_configs
            for p in range(num_blocks):
                attention = (c + 1) % 2 == 0 and p == 0
                if c == 0:
                    blocks.append(TPVConv(in_channels, out_ch, res,
                                          attention, dropout))
                elif k == 0:
                    blocks.append(TPVConv(in_channels + embed_dim, out_ch,
                                          res, attention, dropout))
                in_channels = out_ch
                k += 1
            extra = in_channels
        else:
            extra = in_channels
        num_centers, radius, num_neighbors, out_chs = sa_configs
        blocks.append(TPointNetSA(
            num_centers, radius, num_neighbors,
            extra + (embed_dim if k == 0 else 0), list(out_chs)))
        c += 1
        in_channels = blocks[-1].out_channels
        sa_layers.append(blocks[0] if len(blocks) == 1
                         else nn.Sequential(*blocks))
    sa_in_channels[0] = extra_feature_channels
    return nn.ModuleList(sa_layers), sa_in_channels, in_channels


def build_fp_layers(fp_blocks, in_channels, sa_in_channels, embed_dim,
                    dropout=0.1):
    """`create_pointnet2_fp_modules` (`pvcnn_utils.py:130-168`); the FP
    attention flag is the reference's always-False shadowed check."""
    fp_layers = []
    for fp_idx, (fp_chs, conv_configs) in enumerate(fp_blocks):
        blocks = [TPointNetFP(
            in_channels + sa_in_channels[-1 - fp_idx] + embed_dim,
            list(fp_chs))]
        in_channels = fp_chs[-1]
        if conv_configs is not None:
            out_ch, num_blocks, res = conv_configs
            for p in range(num_blocks):
                blocks.append(TPVConv(in_channels, out_ch, res, False,
                                      dropout))
                in_channels = out_ch
        fp_layers.append(blocks[0] if len(blocks) == 1
                         else nn.Sequential(*blocks))
    return nn.ModuleList(fp_layers), in_channels


def timestep_embedding(embed_dim, t):
    """`pvcnn_utils.py:171-185`."""
    half = embed_dim // 2
    freq = torch.exp(torch.arange(half, dtype=torch.float64)
                     * -(np.log(10000.0) / (half - 1))).float()
    emb = t.float()[:, None] * freq[None, :]
    return torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)


class TorchPVCNN2(nn.Module):
    """`PVCNN2Base_PC2` (`pvcnn.py:10-127`), state_dict-compatible with
    `convert_torch.convert_pvcnn2`."""

    def __init__(self, sa_blocks, fp_blocks, num_classes=3, embed_dim=64,
                 extra_feature_channels=3, dropout=0.1):
        super().__init__()
        self.embed_dim = embed_dim
        sa, sa_in, ch = build_sa_layers(sa_blocks, extra_feature_channels,
                                        embed_dim, dropout)
        self.sa_layers = sa
        self.global_att = TAttention(ch, 8, d=1)
        fp, ch_fp = build_fp_layers(fp_blocks, ch, sa_in, embed_dim,
                                    dropout)
        self.fp_layers = fp
        self.classifier = nn.Sequential(
            TSharedMLP(ch_fp, 128), nn.Dropout(dropout),
            nn.Conv1d(128, num_classes, 1))
        self.embedf = nn.Sequential(
            nn.Linear(embed_dim, embed_dim), nn.LeakyReLU(0.1),
            nn.Linear(embed_dim, embed_dim))

    def forward(self, inputs, t):
        t_emb = self.embedf(timestep_embedding(self.embed_dim, t))
        t_emb = t_emb[:, :, None].expand(-1, -1, inputs.shape[-1])
        coords = inputs[:, :3, :].contiguous()
        features = inputs
        coords_list, in_features_list = [], []
        for i, sa in enumerate(self.sa_layers):
            in_features_list.append(features)
            coords_list.append(coords)
            fin = features if i == 0 else torch.cat([features, t_emb],
                                                    dim=1)
            features, coords, t_emb = sa((fin, coords, t_emb))
        in_features_list[0] = inputs[:, 3:, :].contiguous()
        features = self.global_att(features)
        for fp_idx, fp in enumerate(self.fp_layers):
            features, coords, t_emb = fp((
                coords_list[-1 - fp_idx], coords,
                torch.cat([features, t_emb], dim=1),
                in_features_list[-1 - fp_idx], t_emb))
        return self.classifier(features)


class TorchPVCNNFuse(nn.Module):
    """`PVCNNBase_fuse` (`pvcnn_fuse.py:14-237`), state_dict-compatible
    with `convert_torch.convert_fusion_checkpoint` key layout (tower
    attrs `pc2_model_sa_layers`, `pvd_model_sa_layers`, ...)."""

    def __init__(self, sa_blocks, fp_blocks, num_classes=3, embed_dim=64,
                 extra_feature_channels=3, dropout=0.1):
        super().__init__()
        self.embed_dim = embed_dim
        sa, sa_in, ch = build_sa_layers(sa_blocks, extra_feature_channels,
                                        embed_dim, dropout)
        self.pc2_model_sa_layers = sa
        self.pc2_model_global_att = TAttention(ch, 8, d=1)
        sa_p, _, ch_p = build_sa_layers(sa_blocks, 0, embed_dim, dropout)
        self.pvd_model_sa_layers = sa_p
        self.pvd_model_global_att = TAttention(ch_p, 8, d=1)
        fp, ch_fp = build_fp_layers(fp_blocks, ch, sa_in, embed_dim,
                                    dropout)
        self.fusion_decoder_fp_layers = fp
        self.classifier = nn.Sequential(
            TSharedMLP(ch_fp, 128), nn.Dropout(dropout),
            nn.Conv1d(128, num_classes, 1))
        self.embedf = nn.Sequential(
            nn.Linear(embed_dim, embed_dim), nn.LeakyReLU(0.1),
            nn.Linear(embed_dim, embed_dim))
        # zero-conv fusion projections (`pvcnn_fuse.py:111-123`); dims are
        # the skip widths of the chosen specs plus the bottleneck
        dims = [s.out_channels if isinstance(s, TPointNetSA)
                else s[-1].out_channels for s in sa_p][:-1] + [ch_p]
        self.projs = nn.ModuleList([
            nn.Sequential(nn.Conv1d(d, d, 1), nn.LeakyReLU(0.02),
                          nn.Conv1d(d, d, 1), nn.Conv1d(d, d, 1))
            for d in dims])

    def forward(self, recon_inputs_with_cond, input_from_prior, t,
                mode="fusion_nstep"):
        t_emb0 = self.embedf(timestep_embedding(self.embed_dim, t))
        n = recon_inputs_with_cond.shape[-1]
        t_emb = t_emb0[:, :, None].expand(-1, -1, n)
        coords_pc2 = recon_inputs_with_cond[:, :3, :].contiguous()
        features_pc2 = recon_inputs_with_cond
        if mode == "fusion_nstep":
            coords_pvd = input_from_prior.clone()
        else:
            coords_pvd = coords_pc2.clone()
        features_pvd = coords_pvd.clone()

        coords_list, pc2_skips = [], []
        for i, sa in enumerate(self.pc2_model_sa_layers):
            pc2_skips.append(features_pc2)
            coords_list.append(coords_pc2)
            fin = features_pc2 if i == 0 else torch.cat(
                [features_pc2, t_emb], dim=1)
            features_pc2, coords_pc2, t_emb = sa((fin, coords_pc2, t_emb))
        pc2_skips[0] = recon_inputs_with_cond[:, 3:, :].contiguous()
        features_pc2 = self.pc2_model_global_att(features_pc2)
        t_emb_dec = t_emb

        # PVD tower with a fresh full-resolution temb (see module
        # docstring: the reference's reuse of the downsampled temb here is
        # out-of-bounds UB on CUDA)
        t_emb_p = t_emb0[:, :, None].expand(-1, -1, coords_pvd.shape[-1])
        pvd_skips = []
        for i, sa in enumerate(self.pvd_model_sa_layers):
            pvd_skips.append(features_pvd)
            fin = features_pvd if i == 0 else torch.cat(
                [features_pvd, t_emb_p], dim=1)
            features_pvd, coords_pvd, t_emb_p = sa((fin, coords_pvd,
                                                    t_emb_p))
        features_pvd = self.pvd_model_global_att(features_pvd)

        features = self.projs[-1](features_pvd) + features_pc2
        fused_skips = [pc2_skips[0]]
        for i, (pc2_s, pvd_s) in enumerate(zip(pc2_skips[1:],
                                               pvd_skips[1:])):
            fused_skips.append(self.projs[i](pvd_s) + pc2_s)

        for fp_idx, fp in enumerate(self.fusion_decoder_fp_layers):
            features, coords_pc2, t_emb_dec = fp((
                coords_list[-1 - fp_idx], coords_pc2,
                torch.cat([features, t_emb_dec], dim=1),
                fused_skips[-1 - fp_idx], t_emb_dec))
        return self.classifier(features)
