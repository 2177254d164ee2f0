"""Checkpoint-converter tests.

Strategy: synthesize a reference-shaped torch state dict by INVERTING the
converter's layout rules over a real flax param tree, then convert it back
and require exact equality (round-trip), plus a full-size shapes-only check
against `jax.eval_shape` of the real backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_tpu.models import PVCNN2
from bdm_tpu.models.pvcnn import build_pvcnn2_specs
from bdm_tpu.utils.convert_torch import (
    convert_pvcnn2,
    convert_pvd_checkpoint,
    strip_module,
)
from tests.test_models import TINY_FP, TINY_SA


def _inv_dense(kernel, bias=None, conv1x1=False, dims=0):
    """flax Dense -> torch Linear/ConvNd 1x1 weight."""
    w = np.transpose(np.asarray(kernel))
    if conv1x1:
        w = w.reshape(w.shape + (1,) * dims)
    out = {"weight": w}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def _emit(sd, prefix, tensors):
    for name, arr in tensors.items():
        sd[f"{prefix}.{name}"] = arr


def _inv_shared_mlp(sd, prefix, tree, conv_dims):
    j = 0
    while f"conv{j}" in tree:
        _emit(sd, f"{prefix}.layers.{3 * j}",
              _inv_dense(tree[f"conv{j}"]["kernel"],
                         tree[f"conv{j}"]["bias"], conv1x1=True,
                         dims=conv_dims))
        _emit(sd, f"{prefix}.layers.{3 * j + 1}", {
            "weight": np.asarray(tree[f"norm{j}"]["scale"]),
            "bias": np.asarray(tree[f"norm{j}"]["bias"])})
        j += 1


def _inv_attention(sd, prefix, tree, conv_dims):
    for k in ("q", "k", "v", "out"):
        _emit(sd, f"{prefix}.{k}",
              _inv_dense(tree[k]["kernel"], tree[k]["bias"], conv1x1=True,
                         dims=conv_dims))
    _emit(sd, f"{prefix}.norm", {
        "weight": np.asarray(tree["norm"]["scale"]),
        "bias": np.asarray(tree["norm"]["bias"])})


def _inv_pvconv(sd, prefix, tree):
    for flax_name, idx in (("vconv0", 0), ("vconv1", 4)):
        w = np.transpose(np.asarray(tree[flax_name]["kernel"]),
                         (4, 3, 0, 1, 2))  # (k,k,k,in,out)->(out,in,k,k,k)
        _emit(sd, f"{prefix}.voxel_layers.{idx}",
              {"weight": w, "bias": np.asarray(tree[flax_name]["bias"])})
    for flax_name, idx in (("vnorm0", 1), ("vnorm1", 5)):
        _emit(sd, f"{prefix}.voxel_layers.{idx}", {
            "weight": np.asarray(tree[flax_name]["scale"]),
            "bias": np.asarray(tree[flax_name]["bias"])})
    if "vatt" in tree:
        _inv_attention(sd, f"{prefix}.voxel_layers.6", tree["vatt"], 3)
    sd[f"{prefix}.voxel_layers.7.fc.0.weight"] = np.transpose(
        np.asarray(tree["se"]["fc1"]["kernel"]))
    sd[f"{prefix}.voxel_layers.7.fc.2.weight"] = np.transpose(
        np.asarray(tree["se"]["fc2"]["kernel"]))
    _inv_shared_mlp(sd, f"{prefix}.point_features", tree["point_features"], 1)


def make_torch_state_dict(params, specs, prefix="model"):
    """Inverse of convert_pvcnn2 over a flax PVCNN2 param tree."""
    p = params["params"]
    sd = {}
    _emit(sd, f"{prefix}.embedf.0",
          _inv_dense(p["embedf"]["fc1"]["kernel"], p["embedf"]["fc1"]["bias"]))
    _emit(sd, f"{prefix}.embedf.2",
          _inv_dense(p["embedf"]["fc2"]["kernel"], p["embedf"]["fc2"]["bias"]))

    enc = p["encoder"]
    for i, stage in enumerate(specs.sa_stages):
        n_convs = len(stage.convs)
        base = f"{prefix}.sa_layers.{i}"
        for q in range(n_convs):
            _inv_pvconv(sd, f"{base}.{q}", enc[f"sa{i}_conv{q}"])
        sa_prefix = f"{base}.{n_convs}" if n_convs else base
        _inv_shared_mlp(sd, f"{sa_prefix}.mlps.0",
                        enc[f"sa{i}_pool"]["mlp"], 2)
    if "global_att" in enc:
        _inv_attention(sd, f"{prefix}.global_att", enc["global_att"], 1)

    dec = p["decoder"]
    for i, stage in enumerate(specs.fp_stages):
        base = f"{prefix}.fp_layers.{i}"
        _inv_shared_mlp(sd, f"{base}.0.mlp", dec[f"fp{i}_mlp"]["mlp"], 1)
        for q in range(len(stage.convs)):
            _inv_pvconv(sd, f"{base}.{q + 1}", dec[f"fp{i}_conv{q}"])
    _inv_shared_mlp(sd, f"{prefix}.classifier.0", dec["classifier_mlp"], 1)
    _emit(sd, f"{prefix}.classifier.2",
          _inv_dense(dec["classifier_out"]["kernel"],
                     dec["classifier_out"]["bias"], conv1x1=True, dims=1))
    return sd


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        path, sorted(a.keys()), sorted(b.keys()))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + k)


def test_roundtrip_tiny_pvcnn():
    model = PVCNN2(out_channels=3, embed_dim=8, extra_feature_channels=5,
                   sa_blocks=TINY_SA, fp_blocks=TINY_FP)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 8)),
                        jnp.zeros((1,), jnp.int32))
    specs = build_pvcnn2_specs(TINY_SA, TINY_FP, extra_feature_channels=5)
    sd = make_torch_state_dict(params, specs)

    # inject converter under the tiny specs by monkey-patching the builder
    from bdm_tpu.utils import convert_torch as ct
    converted = {"params": {
        "embedf": ct._timestep_mlp(sd, "model.embedf"),
        "encoder": ct.convert_encoder(sd, "model", specs),
        "decoder": ct.convert_decoder(sd, "model", specs),
    }}
    _tree_equal(params["params"], converted["params"])


def test_full_size_pvd_shapes_match():
    """Synthesize a full-size PVD torch state dict from eval_shape shapes
    and check the converted tree matches the flax init structurally."""
    from bdm_tpu.samplers import PVDModel
    pvd = PVDModel()
    shapes = jax.eval_shape(pvd.backbone.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 3)), jnp.zeros((1,), jnp.int32))
    # fill a tree of real (cheap) arrays with the right shapes
    filled = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, dtype=np.float32), shapes)
    specs = build_pvcnn2_specs(extra_feature_channels=0)
    sd = make_torch_state_dict(filled, specs, prefix="model.module.model")
    # DataParallel-style prefix handling
    sd = {k.replace("model.module.model.", "model.module."): v
          for k, v in sd.items()}
    converted = convert_pvd_checkpoint(sd)

    def assert_same_structure(a, b, path=""):
        assert set(a.keys()) == set(b.keys()), (path, a.keys(), b.keys())
        for k in a:
            if isinstance(a[k], dict):
                assert_same_structure(a[k], b[k], path + "/" + k)
            else:
                assert a[k].shape == np.asarray(b[k]).shape, (
                    path + "/" + k, a[k].shape, np.asarray(b[k]).shape)

    assert_same_structure(shapes["params"], converted["params"])


def test_strip_module():
    sd = {"module.a.weight": 1, "model.module.b.bias": 2, "c": 3}
    out = strip_module(sd)
    assert set(out) == {"a.weight", "model.b.bias", "c"}


def test_vit_converter_shapes():
    """Synthesize a timm-shaped ViT state dict and check the converted tree
    loads into our flax VisionTransformer (apply runs)."""
    import jax
    import jax.numpy as jnp
    from bdm_tpu.models.feature_model import VisionTransformer
    from bdm_tpu.utils.convert_torch import convert_vit

    depth, heads, d, p, s = 2, 2, 8, 4, 8
    rng = np.random.default_rng(0)
    sd = {
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "pos_embed": rng.standard_normal(
            (1, 1 + (s // p) ** 2, d)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal(
            (d, 3, p, p)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "norm.weight": np.ones(d, np.float32),
        "norm.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        sd[f"blocks.{i}.norm1.weight"] = np.ones(d, np.float32)
        sd[f"blocks.{i}.norm1.bias"] = np.zeros(d, np.float32)
        sd[f"blocks.{i}.norm2.weight"] = np.ones(d, np.float32)
        sd[f"blocks.{i}.norm2.bias"] = np.zeros(d, np.float32)
        sd[f"blocks.{i}.attn.qkv.weight"] = rng.standard_normal(
            (3 * d, d)).astype(np.float32)
        sd[f"blocks.{i}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        sd[f"blocks.{i}.attn.proj.weight"] = rng.standard_normal(
            (d, d)).astype(np.float32)
        sd[f"blocks.{i}.attn.proj.bias"] = np.zeros(d, np.float32)
        sd[f"blocks.{i}.mlp.fc1.weight"] = rng.standard_normal(
            (4 * d, d)).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        sd[f"blocks.{i}.mlp.fc2.weight"] = rng.standard_normal(
            (d, 4 * d)).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc2.bias"] = np.zeros(d, np.float32)

    params = {"params": convert_vit(sd, "", depth=depth, num_heads=heads)}
    vit = VisionTransformer(patch_size=p, embed_dim=d, depth=depth,
                            num_heads=heads)
    ref = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)))

    def same_structure(a, b, path=""):
        assert set(a.keys()) == set(b.keys()), (path, a.keys(), b.keys())
        for k in a:
            if isinstance(a[k], dict):
                same_structure(a[k], b[k], path + "/" + k)
            else:
                assert np.asarray(a[k]).shape == np.asarray(b[k]).shape, \
                    (path + "/" + k)

    same_structure(ref["params"], params["params"])
    out = vit.apply(params, jnp.ones((2, s, s, 3)))
    assert out.shape == (2, 1 + (s // p) ** 2, d)
    assert np.isfinite(np.asarray(out)).all()
