"""Shared nn layers (channel-last): SharedMLP, Attention, SE, embeddings.

Reference modules: `experiments/model/pvcnn/modules/*.py` (byte-identical
copy under `experiments/pvd/modules/`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torch.nn.GroupNorm default epsilon (flax default is 1e-6)
GN_EPS = 1e-5


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (`modules/pvconv.py:12-14`)."""
    return jax.nn.silu(x)


def get_timestep_embedding(embed_dim: int, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [sin | cos] order
    (`pvcnn_utils.py:171-185`).

    Args:
        embed_dim: embedding width.
        timesteps: (B,) int or float timesteps.

    Returns:
        (B, embed_dim) float32.
    """
    assert timesteps.ndim == 1
    half_dim = embed_dim // 2
    freq = np.exp(np.arange(half_dim) * -(np.log(10000.0) / (half_dim - 1)))
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.asarray(
        freq, dtype=jnp.float32)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embed_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class SharedMLP(nn.Module):
    """(1x1 conv -> GroupNorm(8) -> Swish) x k over the last axis
    (`modules/shared_mlp.py:11-38`). Works on any rank: (B, ..., C)."""

    out_channels: Sequence[int]
    dtype: Any = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, oc in enumerate(self.out_channels):
            x = nn.Dense(oc, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=GN_EPS, dtype=self.dtype,
                             name=f"norm{i}")(x)
            x = swish(x)
        return x


class Attention(nn.Module):
    """Self-attention over the spatial axis WITHOUT 1/sqrt(C) scaling,
    with residual + GroupNorm + Swish (`modules/pvconv.py:17-63`).

    Input: (B, S, C) where S is flattened voxels (D=3) or points (D=1).
    """

    num_groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v")(x)
        # note: the reference deliberately omits the 1/sqrt(C) scale
        # (`pvconv.py:51`); replicate for checkpoint parity.
        from bdm_tpu.ops.voxelize import _use_pallas_scatter
        s = x.shape[1]
        if (_use_pallas_scatter() and s >= 2048 and s % 512 == 0
                and c <= 128):
            # big-S sites (the S=4096 voxel attention): blocked VMEM
            # kernel — XLA's einsum mega-fusion ran 0.83 ms vs the
            # 0.17 ms roofline (profiled r3)
            from bdm_tpu.ops.pallas.attention import attention_pallas
            h = attention_pallas(q, k, v)
        else:
            logits = jnp.einsum("bic,bjc->bij", q, k)
            # softmax in f32 regardless of compute dtype
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            w = w.astype(v.dtype)
            h = jnp.einsum("bij,bjc->bic", w, v)
        h = nn.Dense(c, dtype=self.dtype, name="out")(h)
        x = x + h
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=GN_EPS,
                         dtype=self.dtype, name="norm")(x)
        return swish(x)


class SE(nn.Module):
    """Squeeze-excitation over a voxel grid (B, X, Y, Z, C)
    (`modules/se.py:8-19`), reduction 8.

    With `return_scale` the (B, C) sigmoid gate is returned instead of the
    scaled grid: the per-channel scale commutes with the (linear) trilinear
    devoxelization, so PVConv applies it to the (B, N, C) point features —
    skipping a full read+write pass over the voxel grid."""

    reduction: int = 8
    use_relu: bool = False
    dtype: Any = None
    return_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = x.mean(axis=(1, 2, 3))  # (B, C)
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     name="fc1")(s)
        s = jax.nn.relu(s) if self.use_relu else swish(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        if self.return_scale:
            return s.astype(jnp.float32)
        return x * s[:, None, None, None, :]


class TimestepMLP(nn.Module):
    """embedf: Dense -> LeakyReLU(0.1) -> Dense (`pvcnn.py:72-76`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, name="fc1")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        return nn.Dense(self.embed_dim, name="fc2")(x)
