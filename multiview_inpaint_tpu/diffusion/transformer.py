"""Transformer blocks for the diffusion UNet (flax.linen, NHWC/NLC).

Functional parity with ``sgm/modules/attention.py`` (CrossAttention,
FeedForward/GEGLU, BasicTransformerBlock, SpatialTransformer) and
``sgm/modules/video_attention.py`` (VideoTransformerBlock,
SpatialVideoTransformer), re-expressed on one attention op
(``attention_op.attention``) that XLA fuses/flash-lowers on TPU.

Module/parameter names intentionally mirror the torch key space with dots
replaced by underscores (``to_q``, ``ff.net.0.proj`` -> ``ff_net_0_proj``)
so checkpoint import is a mechanical key rewrite (see ``weights_io.py``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention_op import attention
from .layers import AlphaBlender, GroupNorm32, timestep_embedding


class CrossAttention(nn.Module):
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        out = attention(q, k, v, self.heads)
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class GEGLUFeedForward(nn.Module):
    dim_out: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = int(x.shape[-1] * self.mult)
        h = nn.Dense(inner * 2, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate)
        return nn.Dense(self.dim_out, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        a1_ctx = context if self.disable_self_attn else None
        x = CrossAttention(self.dim, self.context_dim if
                           self.disable_self_attn else None,
                           self.n_heads, self.d_head, name="attn1")(
            nn.LayerNorm(name="norm1")(x), a1_ctx) + x
        x = CrossAttention(self.dim, self.context_dim, self.n_heads,
                           self.d_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context) + x
        x = GEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(name="norm3")(x)) + x
        return x


class VideoTransformerBlock(nn.Module):
    """Temporal transformer over the frame axis (``(b s) t c`` layout)."""
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    ff_in: bool = True

    @nn.compact
    def __call__(self, x, context=None, timesteps: int = 1):
        b_t, s, c = x.shape
        b = b_t // timesteps
        # (b t) s c -> (b s) t c
        x = x.reshape(b, timesteps, s, c).transpose(0, 2, 1, 3).reshape(
            b * s, timesteps, c)
        if self.ff_in:
            x = GEGLUFeedForward(self.dim, name="ff_in")(
                nn.LayerNorm(name="norm_in")(x)) + x
        x = CrossAttention(self.dim, None, self.n_heads, self.d_head,
                           name="attn1")(nn.LayerNorm(name="norm1")(x)) + x
        x = CrossAttention(self.dim, self.context_dim, self.n_heads,
                           self.d_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context) + x
        x = GEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(name="norm3")(x)) + x
        # (b s) t c -> (b t) s c
        x = x.reshape(b, s, timesteps, c).transpose(0, 2, 1, 3).reshape(
            b * timesteps, s, c)
        return x


class SpatialVideoTransformer(nn.Module):
    """Spatial attention + temporal time_stack with AlphaBlender merge.

    Always ``use_linear`` (the SVD configuration).
    """
    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_spatial_context: bool = True
    merge_strategy: str = "learned_with_images"
    ff_in: bool = True
    max_time_embed_period: int = 10000

    @nn.compact
    def __call__(self, x, context=None, timesteps: int = 1,
                 image_only_indicator=None):
        b_t, h, w, c = x.shape
        x_in = x
        inner = self.n_heads * self.d_head

        time_context = None
        if self.use_spatial_context and context is not None:
            # context [(b t), L, D]; temporal blocks see frame-0 context
            # repeated per spatial position.
            first = context[::timesteps]                      # [b, L, D]
            time_context = jnp.repeat(first, h * w, axis=0)   # [(b h w),L,D]

        x = GroupNorm32(name="norm")(x)
        x = x.reshape(b_t, h * w, c)
        x = nn.Dense(inner, name="proj_in")(x)

        # Frame-index positional embedding.
        frames = jnp.tile(jnp.arange(timesteps), b_t // timesteps)
        t_emb = timestep_embedding(frames, self.in_channels,
                                   self.max_time_embed_period
                                   ).astype(x.dtype)
        emb = nn.Dense(self.in_channels * 4, name="time_pos_embed_0")(t_emb)
        emb = nn.Dense(self.in_channels,
                       name="time_pos_embed_2")(nn.silu(emb))
        emb = emb[:, None, :]

        blender = AlphaBlender(merge_strategy=self.merge_strategy,
                               name="time_mixer")
        for d in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.n_heads, self.d_head,
                context_dim=self.context_dim,
                name=f"transformer_blocks_{d}")(x, context)
            x_mix = x + emb
            x_mix = VideoTransformerBlock(
                inner, self.n_heads, self.d_head,
                context_dim=(self.context_dim if self.use_spatial_context
                             else None),
                ff_in=self.ff_in, name=f"time_stack_{d}")(
                x_mix, time_context, timesteps)
            x = blender(x, x_mix, image_only_indicator)
        x = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     name="proj_out")(x)
        return x.reshape(b_t, h, w, c) + x_in
