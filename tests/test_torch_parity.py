"""Activation parity between REAL torch modules and the flax twins via the
checkpoint converter.

Round 1 only round-trip-tested `convert_torch` against its own inverse — a
layout rule wrong on both sides would pass. Here the torch side is built
with actual `torch.nn` modules laid out exactly like the reference's
importable submodules (SharedMLP `modules/shared_mlp.py:11-38`, SE3d
`modules/se.py:8-19`, Attention `modules/pvconv.py:17-63`, embedf
`pvcnn.py:72-76`, timm ViT blocks `feature_model.py:16-34`), randomized,
converted with `bdm_tpu.utils.convert_torch`, and checked for fp32
activation parity on CPU (no CUDA extension needed).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bdm_tpu.models import layers as L  # noqa: E402
from bdm_tpu.models.feature_model import VisionTransformer  # noqa: E402
from bdm_tpu.utils import convert_torch as C  # noqa: E402

RTOL, ATOL = 2e-5, 2e-5


def _sd(module, prefix=""):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    if prefix:
        sd = {f"{prefix}.{k}": v for k, v in sd.items()}
    return sd


def _rand_init(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)


class _Swish(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


def test_shared_mlp_parity():
    # torch layout: layers = Sequential(Conv1d, GroupNorm(8), Swish) * k
    ch = (16, 24)
    mods = []
    in_c = 10
    for oc in ch:
        mods += [tnn.Conv1d(in_c, oc, 1), tnn.GroupNorm(8, oc), _Swish()]
        in_c = oc
    tmod = tnn.Sequential()
    tmod.layers = tnn.Sequential(*mods)
    _rand_init(tmod, 0)

    x = np.random.default_rng(0).standard_normal((2, 10, 33)).astype(
        np.float32)
    want = tmod.layers(torch.from_numpy(x)).detach().numpy()  # (B, C, N)

    params = C._shared_mlp({f"m.{k}": v for k, v in _sd(tmod).items()},
                           "m", len(ch))
    got = L.SharedMLP(ch).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=RTOL, atol=ATOL)


def test_se3d_parity():
    c = 32
    tmod = tnn.Module()
    tmod.fc = tnn.Sequential(
        tnn.Linear(c, c // 8, bias=False), _Swish(),
        tnn.Linear(c // 8, c, bias=False), tnn.Sigmoid())
    _rand_init(tmod, 1)

    x = np.random.default_rng(1).standard_normal((2, c, 4, 4, 4)).astype(
        np.float32)
    xt = torch.from_numpy(x)
    want = (xt * tmod.fc(xt.mean(-1).mean(-1).mean(-1)).view(2, c, 1, 1, 1)
            ).detach().numpy()

    sd = _sd(tmod, "p.voxel_layers.7")
    params = {
        "fc1": {"kernel": C.t_linear(sd["p.voxel_layers.7.fc.0.weight"])},
        "fc2": {"kernel": C.t_linear(sd["p.voxel_layers.7.fc.2.weight"])},
    }
    got = L.SE().apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want, rtol=RTOL, atol=ATOL)


class _TorchAttention(tnn.Module):
    """The reference's no-1/sqrt(C) attention (`pvconv.py:17-63`), D=1."""

    def __init__(self, c, groups):
        super().__init__()
        self.q = tnn.Conv1d(c, c, 1)
        self.k = tnn.Conv1d(c, c, 1)
        self.v = tnn.Conv1d(c, c, 1)
        self.out = tnn.Conv1d(c, c, 1)
        self.norm = tnn.GroupNorm(groups, c)

    def forward(self, x):
        b, c = x.shape[:2]
        q = self.q(x).reshape(b, c, -1)
        k = self.k(x).reshape(b, c, -1)
        v = self.v(x).reshape(b, c, -1)
        w = torch.softmax(torch.matmul(q.permute(0, 2, 1), k), -1)
        h = torch.matmul(v, w.permute(0, 2, 1)).reshape(b, c, *x.shape[2:])
        h = self.out(h)
        x = h + x
        x = self.norm(x)
        return x * torch.sigmoid(x)


def test_attention_parity():
    c = 16
    tmod = _TorchAttention(c, 8)
    _rand_init(tmod, 2)
    x = (np.random.default_rng(2).standard_normal((2, c, 21)) * 0.5).astype(
        np.float32)
    want = tmod(torch.from_numpy(x)).detach().numpy()

    params = C._attention(_sd(tmod, "a"), "a")
    got = L.Attention(num_groups=8).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=5e-5, atol=5e-5)


def test_embedf_parity():
    e = 24
    tmod = tnn.Sequential(tnn.Linear(e, e), tnn.LeakyReLU(0.1),
                          tnn.Linear(e, e))
    _rand_init(tmod, 3)
    x = np.random.default_rng(3).standard_normal((5, e)).astype(np.float32)
    want = tmod(torch.from_numpy(x)).detach().numpy()
    params = C._timestep_mlp(_sd(tmod, "embedf"), "embedf")
    got = L.TimestepMLP(e).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_conv3d_parity():
    """t_conv3d: torch Conv3d NCDHW (out,in,k,k,k) -> flax NDHWC."""
    import flax.linen as fnn
    tmod = tnn.Conv3d(6, 10, 3, padding=1)
    _rand_init(tmod, 4)
    x = np.random.default_rng(4).standard_normal((2, 6, 5, 5, 5)).astype(
        np.float32)
    want = tmod(torch.from_numpy(x)).detach().numpy()
    sd = _sd(tmod, "c")
    params = {"kernel": C.t_conv3d(sd["c.weight"]), "bias": sd["c.bias"]}
    got = fnn.Conv(10, (3, 3, 3), padding="SAME").apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               want, rtol=RTOL, atol=ATOL)


# ------------------------------------------------------------------- ViT

class _TimmBlock(tnn.Module):
    """timm VisionTransformer block: prenorm fused-qkv attention + MLP."""

    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        h, dh = self.heads, d // self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, t, 3, h, dh).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        w = torch.softmax(q @ k.transpose(-2, -1) * dh ** -0.5, -1)
        y = (w @ v).transpose(1, 2).reshape(b, t, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class _TimmViT(tnn.Module):
    def __init__(self, img=16, patch=4, d=16, depth=2, heads=2):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, patch, stride=patch)
        t = (img // patch) ** 2 + 1
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = tnn.Parameter(torch.zeros(1, t, d))
        self.blocks = tnn.ModuleList(
            [_TimmBlock(d, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        y = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        y = torch.cat([self.cls_token.expand(b, -1, -1), y], dim=1)
        y = y + self.pos_embed
        for blk in self.blocks:
            y = blk(y)
        return self.norm(y)


def test_vit_parity():
    tmod = _TimmViT()
    _rand_init(tmod, 5)
    x = np.random.default_rng(5).standard_normal((2, 3, 16, 16)).astype(
        np.float32) * 0.5
    want = tmod(torch.from_numpy(x)).detach().numpy()  # (B, T, D)

    params = C.convert_vit(_sd(tmod), "", depth=2, num_heads=2)
    vit = VisionTransformer(patch_size=4, embed_dim=16, depth=2, num_heads=2)
    got = vit.apply({"params": params},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------ composed full-model parity

def _moderate_init(module, seed):
    """Randomize every parameter at activation-safe scales: conv/linear
    weights keep their default (fan-in) init scaled by a random factor,
    norms get off-unit scales — so a layout/wiring error anywhere shows as
    an O(1) activation diff without exploding through 14 stages."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim <= 1:  # biases, norm scales
                p.copy_(torch.randn(p.shape, generator=g) * 0.1
                        + (1.0 if "norm" in name and "weight" in name
                           or name.endswith("scale") else 0.0))
            else:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=g)
                        / np.sqrt(max(fan_in, 1)))


def _composed_pvcnn2_case(sa_blocks, fp_blocks, extra, n, seed,
                          embed_dim=32):
    from tests.torch_ref import TorchPVCNN2
    tm = TorchPVCNN2(sa_blocks, fp_blocks, num_classes=3,
                     embed_dim=embed_dim, extra_feature_channels=extra)
    _moderate_init(tm, seed)
    tm.eval()

    sd = {f"X.{k}": v for k, v in _sd(tm).items()}
    from bdm_tpu.models.pvcnn import PVCNN2
    from bdm_tpu.utils.convert_torch import (convert_encoder,
                                             convert_decoder,
                                             _timestep_mlp)
    from bdm_tpu.models.pvcnn import build_pvcnn2_specs
    specs = build_pvcnn2_specs(sa_blocks, fp_blocks,
                               extra_feature_channels=extra)
    params = {"params": {
        "embedf": _timestep_mlp(sd, "X.embedf"),
        "encoder": convert_encoder(sd, "X", specs),
        "decoder": convert_decoder(sd, "X", specs),
    }}

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, n, 3 + extra)).astype(np.float32)
    x[..., :3] *= 0.5
    t = np.asarray([517], np.int64)

    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 2, 1))),
                  torch.from_numpy(t)).numpy().transpose(0, 2, 1)

    fm = PVCNN2(out_channels=3, embed_dim=embed_dim,
                extra_feature_channels=extra, sa_blocks=sa_blocks,
                fp_blocks=fp_blocks, classifier_init_scale=None)
    got = np.asarray(fm.apply(params, jnp.asarray(x),
                              jnp.asarray(t.astype(np.int32))))
    scale = np.abs(want).max() + 1e-8
    err = np.abs(got - want).max() / scale
    assert err < 2e-3, (err, scale)


def test_composed_pvcnn2_tiny_parity():
    """Full composed forward (encoder+decoder+heads) vs the torch replica
    on tiny specs — a wiring error anywhere fails here, not just
    per-module layout errors."""
    from tests.test_models import TINY_FP, TINY_SA
    _composed_pvcnn2_case(TINY_SA, TINY_FP, extra=5, n=64, seed=0)


@pytest.mark.slow
def test_composed_pvcnn2_production_parity():
    """The reference's complete PVCNN2_PC2 (production block specs,
    390-channel input — `pvcnn.py:130-142`) vs the torch replica."""
    from bdm_tpu.models.pvcnn import PVCNN_FP_BLOCKS, PVCNN_SA_BLOCKS
    _composed_pvcnn2_case(PVCNN_SA_BLOCKS, PVCNN_FP_BLOCKS, extra=387,
                          n=1024, seed=1, embed_dim=64)


def test_composed_fusion_tiny_parity():
    """Full composed PVCNN_fuse forward (two towers + zero-conv fusion +
    decoder, `pvcnn_fuse.py:125-237`) vs the torch replica, both modes."""
    from tests.test_models import TINY_FP, TINY_SA
    from tests.torch_ref import TorchPVCNNFuse
    from bdm_tpu.models.fusion import PVCNNFuse
    from bdm_tpu.utils.convert_torch import convert_fusion_checkpoint

    extra, n, embed_dim = 5, 64, 32
    tm = TorchPVCNNFuse(TINY_SA, TINY_FP, num_classes=3,
                        embed_dim=embed_dim, extra_feature_channels=extra)
    _moderate_init(tm, 3)
    tm.eval()

    # key layout of the reference fusion state dict
    sd = {f"fusion_model.model.{k}": v for k, v in _sd(tm).items()}
    import bdm_tpu.utils.convert_torch as C2
    pc2_specs = C2.build_pvcnn2_specs(TINY_SA, TINY_FP,
                                      extra_feature_channels=extra)
    pvd_specs = C2.build_pvcnn2_specs(TINY_SA, TINY_FP,
                                      extra_feature_channels=0)
    prefix = "fusion_model.model"
    n_projs = len(tm.projs)
    params = {"params": {
        "embedf": C2._timestep_mlp(sd, f"{prefix}.embedf"),
        "decoder": C2.convert_decoder(sd, prefix, pc2_specs,
                                      fp_key="fusion_decoder_fp_layers"),
        "pc2_encoder": C2._convert_tower(
            sd, f"{prefix}.pc2_model_sa_layers",
            f"{prefix}.pc2_model_global_att", pc2_specs),
        "pvd_encoder": C2._convert_tower(
            sd, f"{prefix}.pvd_model_sa_layers",
            f"{prefix}.pvd_model_global_att", pvd_specs),
        **{f"proj{i}": {
            "conv1": C2._dense(sd, f"{prefix}.projs.{i}.0"),
            "conv2": C2._dense(sd, f"{prefix}.projs.{i}.2"),
            "zero_conv": C2._dense(sd, f"{prefix}.projs.{i}.3"),
        } for i in range(n_projs)},
    }}

    rng = np.random.default_rng(4)
    x_cond = rng.standard_normal((1, n, 3 + extra)).astype(np.float32)
    x_cond[..., :3] *= 0.5
    x_prior = (rng.standard_normal((1, n, 3)) * 0.5).astype(np.float32)
    t = np.asarray([203], np.int64)

    fm = PVCNNFuse(out_channels=3, embed_dim=embed_dim,
                   extra_feature_channels=extra, sa_blocks=TINY_SA,
                   fp_blocks=TINY_FP)
    for mode in ("fusion_nstep", "fusion_1step"):
        with torch.no_grad():
            want = tm(torch.from_numpy(np.transpose(x_cond, (0, 2, 1))),
                      torch.from_numpy(np.transpose(x_prior, (0, 2, 1))),
                      torch.from_numpy(t),
                      mode=mode).numpy().transpose(0, 2, 1)
        got = np.asarray(fm.apply(params, jnp.asarray(x_cond),
                                  jnp.asarray(x_prior),
                                  jnp.asarray(t.astype(np.int32)), mode))
        scale = np.abs(want).max() + 1e-8
        err = np.abs(got - want).max() / scale
        assert err < 2e-3, (mode, err, scale)
