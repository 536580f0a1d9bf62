"""VideoUNet — the SVD denoising backbone (flax.linen, NHWC).

Parity with ``sgm/modules/diffusionmodules/video_model.py:84-493`` at the
reference configuration (``configs/test/svd_f_est_ctrl_simp1.yaml:22-40``):
in 8ch (4 latent + 4 cond-frame concat), model 320, out 4, channel_mult
[1,2,4,4], 2 res blocks per level, attention at ds {1,2,4} with
heads = ch/64, context 1024 (OpenCLIP image tokens), adm 768 (fourier
fps/motion/aug vector), VideoResBlocks with (3,1,1) temporal convs and
SpatialVideoTransformers with learned_with_images alpha blending.

The time dimension rides the batch: inputs are [(b t), H, W, C] with
``num_video_frames`` static and ``image_only_indicator`` [b, t] — the
reference's fold-time-into-batch layout, which vectorizes trivially on
TPU (SURVEY.md §5.7).

``ControlledVideoUNet`` behavior (``models/csvd.py:33-115``) is the
``control`` argument: a list of 13 residuals added to the middle output
and each decoder skip.

Structured so ``extract_features=True`` returns every encoder + middle
hidden state — the ControlNet reuses this class for its trunk.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Downsample, GroupNorm32, Upsample, timestep_embedding
from .resblock import VideoResBlock
from .transformer import SpatialVideoTransformer


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    adm_in_channels: int = 768
    video_kernel_size: Tuple[int, ...] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    # The reference zero-initializes the final output conv
    # (openaimodel zero_module(out)), which is parity for
    # checkpoint-IMPORT (real weights overwrite it) but makes a
    # RANDOM-init net's output identically zero — every gradient
    # (incl. the ControlNet's, through the residual injection)
    # vanishes, so random-init training configs (tiny tests, dryruns,
    # synthetic sustained runs) silently train nothing. Those set
    # False to get a small normal init instead.
    out_zero_init: bool = True
    # Rematerialize blocks in the backward pass (use_checkpoint
    # parity). Block-level, not whole-net: a single checkpoint over the
    # full forward stores nothing extra but also saves no peak memory;
    # per-block keeps only block boundaries live. True/"all" remats
    # every res+attn block; "attn" remats only the transformer blocks
    # (whose GEGLU/attention temps dominated the full-size OOM dump)
    # and keeps the cheap-to-store conv activations.
    remat: bool | str = False


class VideoUNet(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None,
                 num_video_frames: int = 1, image_only_indicator=None,
                 control: Optional[List[jnp.ndarray]] = None,
                 extract_features: bool = False,
                 hint: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        ch0 = cfg.model_channels
        ted = ch0 * 4

        # The sinusoid rides f32; cast to the activation dtype BEFORE
        # the MLP — otherwise `h + emb_out` promotes the entire network
        # to f32 from the first ResBlock (profiled: every conv ran
        # 6-pass f32 MXU, ~3x slower than bf16).
        t_emb = timestep_embedding(timesteps, ch0).astype(x.dtype)
        emb = nn.Dense(ted, name="time_embed_0")(t_emb)
        emb = nn.Dense(ted, name="time_embed_2")(nn.silu(emb))
        if y is not None:
            lab = nn.Dense(ted, name="label_emb_0_0")(y.astype(x.dtype))
            lab = nn.Dense(ted, name="label_emb_0_2")(nn.silu(lab))
            emb = emb + lab

        # static_argnums index the bound __call__ with self at 0; slot 3
        # is num_video_frames / timesteps (a static int) in both blocks.
        full = cfg.remat in (True, "all")
        res_cls = (nn.remat(VideoResBlock, static_argnums=(3,))
                   if full else VideoResBlock)
        attn_cls = (nn.remat(SpatialVideoTransformer, static_argnums=(3,))
                    if (full or cfg.remat == "attn")
                    else SpatialVideoTransformer)

        def res(name, out_ch):
            return res_cls(out_ch, cfg.video_kernel_size,
                           cfg.merge_strategy, name=name)

        def attn(name, ch):
            return attn_cls(
                ch, ch // cfg.num_head_channels, cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                merge_strategy=cfg.merge_strategy, name=name)

        # Positional args (remat's static_argnums needs fixed slots).
        kw = (num_video_frames, image_only_indicator)
        akw = (num_video_frames, image_only_indicator)

        hs = []
        feats = []
        h = nn.Conv(ch0, (3, 3), name="input_blocks_0_0")(x)
        if hint is not None:
            h = h + hint
        hs.append(h)
        feats.append(h)
        ds = 1
        ch = ch0
        block_i = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * ch0
                h = res(f"input_blocks_{block_i}_0", ch)(h, emb, *kw)
                if ds in cfg.attention_resolutions:
                    h = attn(f"input_blocks_{block_i}_1", ch)(
                        h, context, *akw)
                hs.append(h)
                feats.append(h)
                block_i += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"input_blocks_{block_i}_0")(h)
                hs.append(h)
                feats.append(h)
                ds *= 2
                block_i += 1

        h = res("middle_block_0", ch)(h, emb, *kw)
        h = attn("middle_block_1", ch)(h, context, *akw)
        h = res("middle_block_2", ch)(h, emb, *kw)
        feats.append(h)

        if extract_features:
            return feats

        if control is not None:
            control = list(control)
            h = h + control.pop()

        block_i = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if control is not None:
                    skip = skip + control.pop()
                ch = mult * ch0
                h = res(f"output_blocks_{block_i}_0", ch)(
                    jnp.concatenate([h, skip], axis=-1), emb, *kw)
                if ds in cfg.attention_resolutions:
                    h = attn(f"output_blocks_{block_i}_1", ch)(
                        h, context, *akw)
                if level and i == cfg.num_res_blocks:
                    up_j = 2 if ds in cfg.attention_resolutions else 1
                    h = Upsample(ch, name=f"output_blocks_{block_i}_{up_j}")(h)
                    ds //= 2
                block_i += 1

        h = GroupNorm32(name="out_0")(h)
        h = nn.Conv(cfg.out_channels, (3, 3),
                    kernel_init=(nn.initializers.zeros
                                 if cfg.out_zero_init else
                                 nn.initializers.normal(0.02)),
                    name="out_2")(nn.silu(h))
        return h
