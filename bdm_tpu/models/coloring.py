"""Point-cloud coloring model (SURVEY.md #22).

Rebuild of `model/model_coloring.py` + `point_cloud_transformer_model.py`:
predicts per-point RGB with a single (non-diffusion) forward through a
stack of [LN -> PVCNN2(t=0) residual, optional LN -> attention residual,
LN -> MLP residual] blocks, trained with color MSE. Conditioning is the
same projection pipeline as PC2.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from bdm_tpu.models.pvcnn import PVCNN2
from bdm_tpu.samplers.pc2 import PC2Model, ProjectionConfig


class PointCloudModelBlock(nn.Module):
    """One transformer-style block whose 'token mixer' is a PVCNN2 run at
    t=0 (`point_cloud_transformer_model.py:13-61`)."""

    dim: int
    use_attn: bool = False
    num_heads: int = 6
    mlp_ratio: float = 4.0
    sa_blocks: Optional[tuple] = None
    fp_blocks: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        kwargs = {}
        if self.sa_blocks is not None:
            kwargs.update(sa_blocks=self.sa_blocks, fp_blocks=self.fp_blocks)
        pv = PVCNN2(out_channels=self.dim, embed_dim=self.dim,
                    extra_feature_channels=self.dim - 3,
                    classifier_init_scale=None, name="pvcnn", **kwargs)
        h = nn.LayerNorm(name="norm0")(x)
        t0 = jnp.zeros((x.shape[0],), jnp.int32)
        x = x + pv(h, t0, deterministic)
        if self.use_attn:
            h = nn.LayerNorm(name="norm1")(x)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name="attn")(h, h)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class PointCloudTransformerModel(nn.Module):
    num_layers: int = 1
    in_channels: int = 3
    out_channels: int = 3
    embed_dim: int = 64
    sa_blocks: Optional[tuple] = None
    fp_blocks: Optional[tuple] = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, deterministic: bool = True):
        x = nn.Dense(self.embed_dim, name="input_projection")(inputs)
        for i in range(self.num_layers):
            x = PointCloudModelBlock(
                dim=self.embed_dim, sa_blocks=self.sa_blocks,
                fp_blocks=self.fp_blocks, name=f"block{i}")(
                x, deterministic)
        init = nn.initializers.normal(1e-6)
        return nn.Dense(self.out_channels, kernel_init=init, bias_init=init,
                        name="output_projection")(x)


class PointCloudColoringModel:
    """Coloring wrapper with PC2-style conditioning
    (`model_coloring.py:13-81`). Params:
    {"feature_model": ..., "point_cloud_model": ...}."""

    def __init__(self, cfg: Optional[ProjectionConfig] = None,
                 point_cloud_model_layers: int = 1,
                 sa_blocks=None, fp_blocks=None):
        if cfg is None:
            cfg = ProjectionConfig(predict_shape=False, predict_color=True)
        assert cfg.predict_color and not cfg.predict_shape, (
            "coloring predicts color, not shape")
        # reuse PC2's channel accounting / conditioning machinery
        self.pc2 = PC2Model.__new__(PC2Model)
        PC2Model.__init__(self.pc2, cfg, sa_blocks=sa_blocks,
                          fp_blocks=fp_blocks)
        self.cfg = cfg
        self.model = PointCloudTransformerModel(
            num_layers=point_cloud_model_layers,
            in_channels=self.pc2.in_channels,
            out_channels=self.pc2.out_channels,
            embed_dim=cfg.point_cloud_model_embed_dim,
            sa_blocks=sa_blocks, fp_blocks=fp_blocks)

    def init_params(self, key: jax.Array, num_points: int = 128):
        k1, k2 = jax.random.split(key)
        s = self.cfg.image_size
        feat = self.pc2.feature_model.init(
            k1, jnp.zeros((1, s, s, 3), jnp.float32))
        pcm = self.model.init(
            k2, jnp.zeros((1, num_points, self.pc2.in_channels)))
        return {"feature_model": feat, "point_cloud_model": pcm}

    def _predict_colors(self, params, points, batch, deterministic=True,
                        rngs=None):
        cond_map = self.pc2.conditioning_map(
            params, batch["image"], batch.get("mask"),
            batch.get("distance_transform"))
        x_in = self.pc2.x_t_input(points, batch["camera"], cond_map)
        return self.model.apply(params["point_cloud_model"], x_in,
                                deterministic=deterministic, rngs=rngs)

    def loss(self, params, batch: Dict, key: jax.Array,
             noise_std: float = 0.0) -> jnp.ndarray:
        pts = batch["points"] * self.cfg.scale_factor
        colors_gt = (batch["colors"] - self.cfg.colors_mean) \
            / self.cfg.colors_std
        k_noise, k_drop = jax.random.split(key)
        x = pts + noise_std * jax.random.normal(k_noise, pts.shape, pts.dtype)
        pred = self._predict_colors(params, x, batch, deterministic=False,
                                    rngs={"dropout": k_drop})
        return jnp.mean((pred - colors_gt) ** 2)

    def predict(self, params, batch: Dict) -> jnp.ndarray:
        """Single forward: per-point RGB in [0, 1]."""
        pts = batch["points"] * self.cfg.scale_factor
        pred = self._predict_colors(params, pts, batch)
        return jnp.clip(pred * self.cfg.colors_std + self.cfg.colors_mean,
                        0.0, 1.0)
