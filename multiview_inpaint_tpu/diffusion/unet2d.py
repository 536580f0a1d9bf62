"""2D text-conditioned UNet — the SD-2-inpainting backbone for SDS.

Same architecture family as the video UNet minus the temporal stacks:
ResBlocks + SpatialTransformer (self + text-cross attention), 9-channel
input [noisy latents(4) | mask(1) | masked latents(4)], 4-channel eps
output. Default config matches SD-2-inpainting (ch 320, mult [1,2,4,4],
attn at ds {1,2,4}, heads=ch/64, context 1024) so its torch weights map
through ``weights_io.import_unet`` (the 2D keys are a subset of the video
key space).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Downsample, GroupNorm32, Upsample, timestep_embedding
from .resblock import ResBlock
from .transformer import BasicTransformerBlock


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 9
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024


class SpatialTransformer(nn.Module):
    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        x_in = x
        inner = self.n_heads * self.d_head
        x = GroupNorm32(name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(inner, name="proj_in")(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.n_heads, self.d_head,
                context_dim=self.context_dim,
                name=f"transformer_blocks_{d}")(x, context)
        x = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     name="proj_out")(x)
        return x.reshape(b, h, w, c) + x_in


class UNet2D(nn.Module):
    cfg: UNet2DConfig

    @nn.compact
    def __call__(self, x, timesteps, context=None, control=None,
                 extract_features: bool = False, hint=None):
        cfg = self.cfg
        ch0 = cfg.model_channels
        ted = ch0 * 4
        # Cast the f32 sinusoid to the activation dtype before the MLP
        # (an f32 emb would promote the whole net via `h + emb_out`).
        t_emb = timestep_embedding(timesteps, ch0).astype(x.dtype)
        emb = nn.Dense(ted, name="time_embed_0")(t_emb)
        emb = nn.Dense(ted, name="time_embed_2")(nn.silu(emb))

        def attn(name, ch):
            return SpatialTransformer(
                ch, ch // cfg.num_head_channels, cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                name=name)

        hs = []
        feats = []
        h = nn.Conv(ch0, (3, 3), name="input_blocks_0_0")(x)
        if hint is not None:
            h = h + hint
        hs.append(h)
        feats.append(h)
        ds, ch, block_i = 1, ch0, 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * ch0
                h = ResBlock(ch, name=f"input_blocks_{block_i}_0")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = attn(f"input_blocks_{block_i}_1", ch)(h, context)
                hs.append(h)
                feats.append(h)
                block_i += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"input_blocks_{block_i}_0")(h)
                hs.append(h)
                feats.append(h)
                ds *= 2
                block_i += 1

        h = ResBlock(ch, name="middle_block_0")(h, emb)
        h = attn("middle_block_1", ch)(h, context)
        h = ResBlock(ch, name="middle_block_2")(h, emb)
        feats.append(h)

        if extract_features:
            return feats
        if control is not None:
            control = list(control)
            h = h + control.pop()

        block_i = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                ch = mult * ch0
                skip = hs.pop()
                if control is not None:
                    skip = skip + control.pop()
                h = ResBlock(ch, name=f"output_blocks_{block_i}_0")(
                    jnp.concatenate([h, skip], axis=-1), emb)
                if ds in cfg.attention_resolutions:
                    h = attn(f"output_blocks_{block_i}_1", ch)(h, context)
                if level and i == cfg.num_res_blocks:
                    up_j = 2 if ds in cfg.attention_resolutions else 1
                    h = Upsample(ch,
                                 name=f"output_blocks_{block_i}_{up_j}")(h)
                    ds //= 2
                block_i += 1

        h = GroupNorm32(name="out_0")(h)
        return nn.Conv(cfg.out_channels, (3, 3),
                       kernel_init=nn.initializers.zeros,
                       name="out_2")(nn.silu(h))
