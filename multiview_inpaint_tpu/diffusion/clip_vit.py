"""OpenCLIP-style vision transformer (flax) for image conditioning.

Replaces ``FrozenOpenCLIPImageEmbedder`` (``sgm/modules/encoders/
modules.py:597-667``): ViT-H/14 visual tower — 14x14 patch conv, class
token, learned positional embedding, pre-LN transformer (width 1280,
32 layers, 16 heads), post-LN, linear projection to 1024 — returning the
pooled (class-token) embedding. Inputs are expected in [-1, 1]; the
embedder resizes to 224 and applies CLIP normalization exactly like the
reference (bicubic resize, mean/std normalize).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024


TINY_VIT = ViTConfig(image_size=224, patch_size=32, width=64, layers=2,
                     heads=2, output_dim=64)


class _Block(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width,
            name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, name="mlp_c_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] in [-1, 1] -> pooled [B, output_dim]."""
        cfg = self.cfg
        b = x.shape[0]
        # to [0,1], resize, CLIP-normalize
        x = (x + 1.0) / 2.0
        x = jax.image.resize(x, (b, cfg.image_size, cfg.image_size, 3),
                             "bicubic")
        mean = jnp.asarray(CLIP_MEAN, x.dtype)
        std = jnp.asarray(CLIP_STD, x.dtype)
        x = (x - mean) / std

        h = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=False, name="conv1")(x)
        gh = cfg.image_size // cfg.patch_size
        h = h.reshape(b, gh * gh, cfg.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (cfg.width,))
        h = jnp.concatenate(
            [jnp.tile(cls[None, None], (b, 1, 1)), h], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (gh * gh + 1, cfg.width))
        h = h + pos[None]
        h = nn.LayerNorm(name="ln_pre")(h)
        for i in range(cfg.layers):
            h = _Block(cfg.width, cfg.heads, name=f"resblocks_{i}")(h)
        pooled = nn.LayerNorm(name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.output_dim))
        return pooled @ proj
