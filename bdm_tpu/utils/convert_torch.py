"""Convert reference (PyTorch) checkpoints into bdm_tpu param trees.

Covers the three released-checkpoint families (SURVEY.md section 5):
  * PC2  — `ConditionalPointCloudDiffusionModel` state dict
           ({'model': ...} train ckpt or bare state dict), keys under
           `point_cloud_model.model.*` + `feature_model.model.*`
  * PVD  — `pvd.Model` state dict under 'model_state'/'prior_model' with
           DataParallel 'module.' prefixes (`pvd/__init__.py:480-496`)
  * Fusion — `PointCloudFusionModel` state dict
           (`fusion_model.model.*`, `pvcnn_fuse.py:30-123`)

Weight layout conversions (torch -> flax):
  Linear (out,in) -> Dense kernel (in,out)
  Conv1d/2d 1x1 (out,in,1[,1]) -> Dense kernel (in,out)
  Conv3d k^3 (out,in,k,k,k) -> Conv kernel (k,k,k,in,out)
  GroupNorm/LayerNorm weight -> scale
  timm fused qkv (3D,D) -> flax MHA query/key/value kernels (D,H,Dh)

The torch-side key structure is derived from the reference builders
(`pvcnn_utils.py:72-168`): stage 0 = Sequential(PVConv, PVConv, SA);
stages 1-2 = Sequential(PVConv, SA); stage 3 = bare SA; every FP stage =
Sequential(FPModule, PVConv...); PVConv voxel_layers indices
[0 conv, 1 gn, 3/4 conv (no-att PVConvs put the dropout at 3 so the
second conv is 4), 5 gn, 6 attention-or-swish, 7 SE].
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from bdm_tpu.models.pvcnn import PVCNN2Specs, build_pvcnn2_specs


# ------------------------------------------------------------ tensor layout

def t_linear(w):  # (out, in) -> (in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def t_conv1x1(w):  # (out, in, 1[, 1]) -> (in, out)
    w = np.asarray(w)
    return np.ascontiguousarray(
        np.transpose(w.reshape(w.shape[0], w.shape[1])))


def t_conv3d(w):  # (out, in, k, k, k) -> (k, k, k, in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def t_patch_embed(w):  # (D, 3, p, p) -> (p, p, 3, D)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _np(x):
    return np.asarray(x, dtype=np.float32)


# -------------------------------------------------------------- sub-mappers

def _dense(sd, prefix):
    out = {"kernel": t_conv1x1(sd[f"{prefix}.weight"])
           if _np(sd[f"{prefix}.weight"]).ndim > 2
           else t_linear(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _shared_mlp(sd, prefix, num_layers):
    """torch SharedMLP `layers` Sequential: conv at 3j, gn at 3j+1."""
    out = {}
    for j in range(num_layers):
        out[f"conv{j}"] = _dense(sd, f"{prefix}.layers.{3 * j}")
        out[f"norm{j}"] = _norm(sd, f"{prefix}.layers.{3 * j + 1}")
    return out


def _attention(sd, prefix):
    return {
        "q": _dense(sd, f"{prefix}.q"),
        "k": _dense(sd, f"{prefix}.k"),
        "v": _dense(sd, f"{prefix}.v"),
        "out": _dense(sd, f"{prefix}.out"),
        "norm": _norm(sd, f"{prefix}.norm"),
    }


def _pvconv(sd, prefix, attention: bool):
    out = {
        "vconv0": _dense3d(sd, f"{prefix}.voxel_layers.0"),
        "vnorm0": _norm(sd, f"{prefix}.voxel_layers.1"),
        "vconv1": _dense3d(sd, f"{prefix}.voxel_layers.4"),
        "vnorm1": _norm(sd, f"{prefix}.voxel_layers.5"),
        "se": {
            "fc1": {"kernel": t_linear(sd[f"{prefix}.voxel_layers.7.fc.0.weight"])},
            "fc2": {"kernel": t_linear(sd[f"{prefix}.voxel_layers.7.fc.2.weight"])},
        },
        "point_features": _shared_mlp(sd, f"{prefix}.point_features", 1),
    }
    if attention:
        out["vatt"] = _attention(sd, f"{prefix}.voxel_layers.6")
    return out


def _dense3d(sd, prefix):
    return {"kernel": t_conv3d(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _timestep_mlp(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.0"), "fc2": _dense(sd, f"{prefix}.2")}


def convert_encoder(sd: Dict, prefix: str, specs: PVCNN2Specs,
                    use_att: bool = True) -> Dict:
    """Map `sa_layers.*` + `global_att.*` to our PVCNNEncoder subtree."""
    out = {}
    for i, stage in enumerate(specs.sa_stages):
        n_convs = len(stage.convs)
        base = f"{prefix}.sa_layers.{i}"
        for p, cs in enumerate(stage.convs):
            out[f"sa{i}_conv{p}"] = _pvconv(sd, f"{base}.{p}", cs.attention)
        sa_prefix = f"{base}.{n_convs}" if n_convs else base
        out[f"sa{i}_pool"] = {
            "mlp": _shared_mlp(sd, f"{sa_prefix}.mlps.0",
                               len(stage.sa.mlp)),
        }
    if use_att:
        out["global_att"] = _attention(sd, f"{prefix}.global_att")
    return out


def convert_decoder(sd: Dict, prefix: str, specs: PVCNN2Specs,
                    fp_key: str = "fp_layers",
                    classifier_key: str = "classifier") -> Dict:
    out = {}
    for i, stage in enumerate(specs.fp_stages):
        base = f"{prefix}.{fp_key}.{i}"
        out[f"fp{i}_mlp"] = {
            "mlp": _shared_mlp(sd, f"{base}.0.mlp", len(stage.fp_mlp))}
        for p, cs in enumerate(stage.convs):
            out[f"fp{i}_conv{p}"] = _pvconv(sd, f"{base}.{p + 1}",
                                            cs.attention)
    out["classifier_mlp"] = _shared_mlp(
        sd, f"{prefix}.{classifier_key}.0", 1)
    out["classifier_out"] = _dense(sd, f"{prefix}.{classifier_key}.2")
    return out


def convert_pvcnn2(sd: Dict, prefix: str, extra_feature_channels: int
                   ) -> Dict:
    """Full PVCNN2 (PC2 or PVD backbone) -> {'params': {...}}."""
    specs = build_pvcnn2_specs(extra_feature_channels=extra_feature_channels)
    return {"params": {
        "embedf": _timestep_mlp(sd, f"{prefix}.embedf"),
        "encoder": convert_encoder(sd, prefix, specs),
        "decoder": convert_decoder(sd, prefix, specs),
    }}


# -------------------------------------------------------------------- ViT

def convert_vit(sd: Dict, prefix: str, depth: int, num_heads: int) -> Dict:
    """timm VisionTransformer state dict -> our flax VisionTransformer."""
    if prefix and not prefix.endswith("."):
        prefix = prefix + "."
    sd = {k[len(prefix):]: v for k, v in sd.items()
          if k.startswith(prefix)} if prefix else sd
    prefix = ""
    d = _np(sd["cls_token"]).shape[-1]
    dh = d // num_heads

    def qkv(i):
        w = _np(sd[f"blocks.{i}.attn.qkv.weight"])  # (3D, D)
        b = _np(sd[f"blocks.{i}.attn.qkv.bias"])
        wq, wk, wv = np.split(w, 3, axis=0)  # each (D, D): out x in
        bq, bk, bv = np.split(b, 3, axis=0)
        def head(wx, bx):
            return {"kernel": t_linear(wx).reshape(d, num_heads, dh),
                    "bias": bx.reshape(num_heads, dh)}
        proj_w = _np(sd[f"blocks.{i}.attn.proj.weight"])
        return {
            "query": head(wq, bq), "key": head(wk, bk), "value": head(wv, bv),
            "out": {"kernel": t_linear(proj_w).reshape(num_heads, dh, d),
                    "bias": _np(sd[f"blocks.{i}.attn.proj.bias"])},
        }

    params = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "kernel": t_patch_embed(sd["patch_embed.proj.weight"]),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": _norm(sd, "norm"),
    }
    for i in range(depth):
        params[f"block{i}"] = {
            "norm1": _norm(sd, f"blocks.{i}.norm1"),
            "norm2": _norm(sd, f"blocks.{i}.norm2"),
            "attn": qkv(i),
            "mlp": {"fc1": _dense(sd, f"blocks.{i}.mlp.fc1"),
                    "fc2": _dense(sd, f"blocks.{i}.mlp.fc2")},
        }
    return params


# --------------------------------------------------------------- top-levels

def strip_module(sd: Dict) -> Dict:
    """Remove DataParallel 'module.' segments anywhere in keys
    (`training_utils.py:287-289`)."""
    return {k.replace(".module.", ".").removeprefix("module."): v
            for k, v in sd.items()}


def convert_pc2_checkpoint(sd: Dict, in_channels: int = 390,
                           vit_depth: int = 12, vit_heads: int = 6) -> Dict:
    """Reference PC2 state dict -> {'feature_model', 'point_cloud_model'}."""
    sd = strip_module(sd)
    out = {"point_cloud_model": convert_pvcnn2(
        sd, "point_cloud_model.model", extra_feature_channels=in_channels - 3)}
    if any(k.startswith("feature_model.model.") for k in sd):
        out["feature_model"] = {"params": {"vit": convert_vit(
            sd, "feature_model.model", vit_depth, vit_heads)}}
    return out


def convert_pvd_checkpoint(sd: Dict) -> Dict:
    """Reference PVD state dict -> PVCNN2 params (extra channels 0)."""
    sd = strip_module(sd)
    return convert_pvcnn2(sd, "model", extra_feature_channels=0)


def convert_fusion_checkpoint(sd: Dict, in_channels: int = 390) -> Dict:
    """Reference fusion state dict -> PVCNNFuse params."""
    sd = strip_module(sd)
    prefix = "fusion_model.model"
    pc2_specs = build_pvcnn2_specs(extra_feature_channels=in_channels - 3)
    pvd_specs = build_pvcnn2_specs(extra_feature_channels=0)
    params = {
        "embedf": _timestep_mlp(sd, f"{prefix}.embedf"),
        "decoder": convert_decoder(
            sd, prefix, pc2_specs, fp_key="fusion_decoder_fp_layers"),
        # tower weights live under custom attribute names in the reference
        "pc2_encoder": _convert_tower(
            sd, f"{prefix}.pc2_model_sa_layers",
            f"{prefix}.pc2_model_global_att", pc2_specs),
        "pvd_encoder": _convert_tower(
            sd, f"{prefix}.pvd_model_sa_layers",
            f"{prefix}.pvd_model_global_att", pvd_specs),
    }
    for i in range(4):
        params[f"proj{i}"] = {
            "conv1": _dense(sd, f"{prefix}.projs.{i}.0"),
            "conv2": _dense(sd, f"{prefix}.projs.{i}.2"),
            "zero_conv": _dense(sd, f"{prefix}.projs.{i}.3"),
        }
    return {"params": params}


def _convert_tower(sd, sa_prefix, att_prefix, specs):
    """Encoder whose sa_layers/global_att live under custom names."""
    shim = {}
    for k, v in sd.items():
        if k.startswith(sa_prefix + "."):
            shim["X.sa_layers." + k[len(sa_prefix) + 1:]] = v
        elif k.startswith(att_prefix + "."):
            shim["X.global_att." + k[len(att_prefix) + 1:]] = v
    return convert_encoder(shim, "X", specs)


def load_torch_file(path: str) -> Dict:
    """Load a .pth with torch (CPU), returning a flat numpy state dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "model_state", "prior_model", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(
                ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return {k: v.detach().numpy() if hasattr(v, "detach") else v
            for k, v in ckpt.items()}
