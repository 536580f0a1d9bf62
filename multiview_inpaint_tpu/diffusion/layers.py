"""Shared diffusion building blocks (flax.linen, NHWC).

Functionally equivalent to the torch primitives used throughout the
reference sgm stack (``sgm/modules/diffusionmodules/openaimodel.py``,
``util.py``): 32-group GroupNorm with SiLU, sinusoidal timestep embedding
(max_period 10000, [cos|sin]... torch ordering), zero-initialized output
convs/projections, and the learned AlphaBlender that mixes spatial and
temporal branches (``sgm/modules/diffusionmodules/util.py`` AlphaBlender).

TPU notes: NHWC everywhere (XLA-conv native layout); params default f32
with bf16 compute handled by the caller's dtype policy.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """[N] timesteps -> [N, dim] sinusoidal embedding, [cos | sin]
    ordering (sgm/openai ``timestep_embedding`` convention — matters for
    weight import)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) in f32 regardless of compute dtype."""
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x = nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]),
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return x.astype(orig)


def zero_init():
    return nn.initializers.zeros


class ZeroConv(nn.Module):
    """1x1 (or kxk) conv initialized to zero — ControlNet's zero-conv and
    every block's output projection in the reference."""
    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       kernel_init=zero_init(), bias_init=zero_init(),
                       name="conv")(x)


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix: out = a*spatial + (1-a)*temporal.

    merge_strategy:
      - "fixed": constant alpha
      - "learned": sigmoid(mix_factor)
      - "learned_with_images": image frames (indicator==1) use pure
        spatial; video frames use sigmoid(mix_factor).
    ``image_only_indicator``: [B, T] with 1 for image-mode frames.
    """
    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    rearrange_pattern: str = "b t -> (b t) 1 1"

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator=None):
        if self.merge_strategy == "fixed":
            a = jnp.asarray(self.alpha, jnp.float32)
            a = a[None, None, None] if x_spatial.ndim >= 3 else a
        else:
            mix = self.param("mix_factor", nn.initializers.constant(0.0),
                             (1,))
            a = jax.nn.sigmoid(mix)[0]
            if self.merge_strategy == "learned_with_images":
                assert image_only_indicator is not None
                # [B, T] -> broadcastable over x's leading (b t) dim
                flat = (image_only_indicator.reshape(-1) > 0)
                a = jnp.where(flat, 1.0, a)
                extra = (1,) * (x_spatial.ndim - 1)
                a = a.reshape((-1,) + extra)
            else:
                a = jnp.asarray(a)
        a = a.astype(x_spatial.dtype)
        return a * x_spatial + (1.0 - a) * x_temporal


class TimestepEmbedSequentialCall:
    """Marker: modules whose __call__ takes (x, emb, context, ...)."""


class Upsample(nn.Module):
    features: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # 2x nearest via broadcast+reshape: jax.image.resize lowers to a
        # gather that XLA turns into a 64-iteration while loop (~18 ms
        # per SVD guided step).
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(
            b, h * 2, w * 2, c)
        if self.with_conv:
            x = nn.Conv(self.features, (3, 3), name="conv")(x)
        return x


class Downsample(nn.Module):
    features: int
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # Explicit symmetric pad 1: flax's SAME pads (0, 1) for even
            # inputs at stride 2, which samples different pixel positions
            # than the reference's torch conv(stride=2, padding=1) —
            # caught by the full-assembly golden.
            return nn.Conv(self.features, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), name="op")(x)
        return nn.avg_pool(x, (2, 2), (2, 2))
