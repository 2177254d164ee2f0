"""Image feature extractor: a Flax Vision Transformer matching timm's
`VisionTransformer` structure so MAE/MSN torch checkpoints convert 1:1.

Reference: `experiments/model/feature_model.py` — ViT-S/16 (MSN) by
default (embed 384, depth 12, heads 6), ImageNet normalization, output =
patch tokens reshaped to a (H/16, W/16) grid and bilinearly upsampled to
the input resolution (align_corners=False, which is jax.image.resize's
half-pixel convention).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

MODEL_KWARGS = {
    "vit_base_patch16_224_mae": dict(patch_size=16, embed_dim=768, depth=12,
                                     num_heads=12),
    "vit_small_patch16_224_msn": dict(patch_size=16, embed_dim=384, depth=12,
                                      num_heads=6),
    "vit_large_patch7_224_msn": dict(patch_size=7, embed_dim=1024, depth=24,
                                     num_heads=16),
}


class MlpBlock(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, name="fc2")(x)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MlpBlock(int(d * self.mlp_ratio), name="mlp")(y)
        return x + y


class VisionTransformer(nn.Module):
    """timm-compatible ViT. Input (B, H, W, 3); output (B, 1+T, D) tokens
    (CLS first), after the final LayerNorm (timm num_classes=0,
    global_pool='')."""

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        b = images.shape[0]
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(images)
        x = x.reshape(b, -1, self.embed_dim)  # (B, T, D)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)),
                             x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, x.shape[1], self.embed_dim))
        x = x + pos
        for i in range(self.depth):
            x = EncoderBlock(num_heads=self.num_heads, name=f"block{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class FeatureModel(nn.Module):
    """Wraps the ViT with the reference's pre/post-processing
    (`feature_model.py:92-132`): ImageNet-normalize -> ViT -> drop CLS ->
    reshape to a grid -> bilinear upsample to the input size.

    `model_name='identity'` passes the image through unchanged
    (`feature_model.py:54-55,103-104`).
    """

    image_size: int = 224
    model_name: str = "vit_small_patch16_224_msn"

    @property
    def feature_dim(self) -> int:
        if self.model_name == "identity":
            return 3
        return MODEL_KWARGS[self.model_name]["embed_dim"]

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 return_type: str = "features") -> jnp.ndarray:
        """images: (B, H, W, 3) in [0, 1]."""
        if self.model_name == "identity":
            return images
        mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
        x = (images - mean) / std
        kwargs = MODEL_KWARGS[self.model_name]
        tokens = VisionTransformer(name="vit", **kwargs)(x)
        if return_type == "cls_token":
            return tokens[:, 0]
        b, t, d = tokens.shape
        g = int((t - 1) ** 0.5)
        grid = tokens[:, 1:, :].reshape(b, g, g, d)
        feats = jax.image.resize(
            grid, (b, self.image_size, self.image_size, d), method="bilinear")
        if return_type == "features":
            return feats
        return tokens[:, 0], feats
