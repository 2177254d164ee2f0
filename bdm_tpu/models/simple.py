"""Simple (non-PVCNN) point backbones.

Rebuild of `experiments/model/simple/` (SURVEY.md #19) and
`pvcnn_plus_plus.py` (#20):
  * SimplePointModel — a stack of gated feed-forward blocks over
    [point features | max-pool | std-pool] global context, with NeRF-style
    positional encoding (N_freqs=10) and the shared sinusoidal t-embedding
    (`simple_model.py:9-81`, `simple_model_utils.py:87-282`).
  * PVCNN2PlusPlus — SimplePointModel -> residual PVCNN2 -> MLP head with a
    tied timestep embedding (`pvcnn_plus_plus.py:20-42`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from bdm_tpu.models.layers import TimestepMLP, get_timestep_embedding, swish
from bdm_tpu.models.pvcnn import PVCNN2


class PositionalEncoding(nn.Module):
    """NeRF-style sin/cos encoding of xyz, N_freqs octaves + identity."""

    num_freqs: int = 10

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        freqs = 2.0 ** np.arange(self.num_freqs)
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(f * x))
            parts.append(jnp.cos(f * x))
        return jnp.concatenate(parts, axis=-1)

    @property
    def out_dim_per_channel(self) -> int:
        return 1 + 2 * self.num_freqs


class GatedFeedForward(nn.Module):
    """FeedForward with a gated hidden unit (GEGLU-style), residual, and
    LayerNorm, over per-point features with pooled global context."""

    hidden_mult: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        # global context: max-pool and std-pool over points (std in f32)
        gmax = x.max(axis=1, keepdims=True)
        gstd = x.astype(jnp.float32).std(axis=1, keepdims=True).astype(
            x.dtype)
        h = jnp.concatenate(
            [x, jnp.broadcast_to(gmax, x.shape),
             jnp.broadcast_to(gstd, x.shape)], axis=-1)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        a = nn.Dense(d * self.hidden_mult, dtype=self.dtype,
                     name="proj_in")(h)
        g = nn.Dense(d * self.hidden_mult, dtype=self.dtype, name="gate")(h)
        h = a * jnp.tanh(nn.softplus(g))  # mish-style gate
        h = nn.Dense(d, dtype=self.dtype, name="proj_out")(h)
        return x + h


class SimplePointModel(nn.Module):
    """Per-point residual MLP denoiser with global pooling context."""

    out_channels: int = 3
    embed_dim: int = 64
    extra_feature_channels: int = 3
    dim: int = 128
    num_layers: int = 6
    num_freqs: int = 10
    dtype: Any = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, t: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        n = inputs.shape[1]
        temb = get_timestep_embedding(self.embed_dim, t)
        temb = TimestepMLP(self.embed_dim, name="embedf")(temb)
        temb = jnp.broadcast_to(temb[:, None, :],
                                (temb.shape[0], n, temb.shape[-1]))
        pos = PositionalEncoding(self.num_freqs)(inputs[..., :3])
        x = jnp.concatenate([pos, inputs[..., 3:], temb], axis=-1)
        x = nn.Dense(self.dim, dtype=self.dtype, name="input_projection")(x)
        for i in range(self.num_layers):
            x = GatedFeedForward(dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x.astype(jnp.float32))
        init = nn.initializers.normal(1e-6)
        return nn.Dense(self.out_channels, kernel_init=init, bias_init=init,
                        name="output_projection")(x)


class PVCNN2PlusPlus(nn.Module):
    """SimplePointModel features -> residual PVCNN2 -> output head."""

    out_channels: int = 3
    embed_dim: int = 64
    extra_feature_channels: int = 3
    dim: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, t: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        simple = SimplePointModel(
            out_channels=self.dim, embed_dim=self.embed_dim,
            extra_feature_channels=self.extra_feature_channels,
            dim=self.dim, num_layers=2, dtype=self.dtype, name="simple")
        feats = simple(inputs, t, deterministic)
        coords = inputs[..., :3]
        pv_in = jnp.concatenate([coords, feats], axis=-1)
        pv = PVCNN2(out_channels=self.dim, embed_dim=self.embed_dim,
                    extra_feature_channels=self.dim,
                    classifier_init_scale=None, dtype=self.dtype,
                    name="pvcnn")(
            pv_in, t, deterministic)
        x = feats + pv
        x = swish(nn.Dense(self.dim, name="head_fc")(x))
        init = nn.initializers.normal(1e-6)
        return nn.Dense(self.out_channels, kernel_init=init, bias_init=init,
                        name="output_projection")(x)
