"""KL autoencoder: spatial Encoder/Decoder + temporal VideoDecoder.

Parity with ``sgm/modules/diffusionmodules/model.py`` (Encoder/Decoder,
ResnetBlock eps=1e-6, single-head AttnBlock) and
``sgm/modules/autoencoding/temporal_ae.py`` (VideoDecoder with
``time_mode="conv-only"``: every decoder ResnetBlock gains a (3,1,1)
temporal stack mixed by a learned scalar alpha initialized to 0 — i.e. the
pretrained spatial behavior — and ``conv_out`` gains a temporal
``time_mix_conv``). Config: ch=128, ch_mult (1,2,4,4), 2 res blocks,
z=4 (double_z encoder output 8), no attn resolutions, mid attention only.

NHWC layout; the time axis rides the batch as everywhere else.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    double_z: bool = True
    video_kernel_size: Tuple[int, ...] = (3, 1, 1)


def _gn(x, name):
    g = 32 if x.shape[-1] % 32 == 0 else x.shape[-1]
    return nn.GroupNorm(num_groups=g, epsilon=1e-6, name=name)(x)


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x, "norm1"))
        h = nn.Conv(self.out_channels, (3, 3), name="conv1")(h)
        h = nn.silu(_gn(h, "norm2"))
        h = nn.Conv(self.out_channels, (3, 3), name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class VideoResnetBlock(nn.Module):
    """ResnetBlock + (3,1,1) temporal stack, learned alpha (init 0)."""
    out_channels: int
    kernel: Sequence[int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x, timesteps: int = 1):
        x = ResnetBlock(self.out_channels, name="spatial")(x)
        bt, hh, ww, c = x.shape
        b = bt // timesteps
        x5 = x.reshape(b, timesteps, hh, ww, c)
        # time_stack: skip_t_emb ResBlock(dims=3) — openaimodel-style
        # GroupNorm32(eps 1e-5) + SiLU convs, zero-init output conv.
        g = 32 if self.out_channels % 32 == 0 else self.out_channels
        h = nn.GroupNorm(num_groups=g, epsilon=1e-5,
                         name="time_stack_in_norm")(x5)
        h = nn.Conv(self.out_channels, tuple(self.kernel),
                    name="time_stack_in_conv")(nn.silu(h))
        h = nn.GroupNorm(num_groups=g, epsilon=1e-5,
                         name="time_stack_out_norm")(h)
        h = nn.Conv(self.out_channels, tuple(self.kernel),
                    kernel_init=nn.initializers.zeros,
                    name="time_stack_out_conv")(nn.silu(h))
        h = x5 + h
        mix = self.param("mix_factor", nn.initializers.constant(0.0), (1,))
        a = jax.nn.sigmoid(mix)[0]
        out = a * h + (1.0 - a) * x5
        return out.reshape(bt, hh, ww, c)


def _attn_inner(x, make_conv):
    """Single-head q/k/v attention of the reference AttnBlock, WITHOUT
    proj_out or the residual (``model.py`` ``AttnBlock.attention``)."""
    b, h, w, c = x.shape
    hn = _gn(x, "norm")
    q = make_conv("q")(hn).reshape(b, h * w, c)
    k = make_conv("k")(hn).reshape(b, h * w, c)
    v = make_conv("v")(hn).reshape(b, h * w, c)
    attn = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), axis=-1)
    return jnp.einsum("bqk,bkc->bqc", attn, v)


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out = _attn_inner(x, lambda n: nn.Conv(c, (1, 1), name=n))
        out = out.reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(out)


class VideoAttnBlock(nn.Module):
    """Spatio-temporal attention block (``temporal_ae.py:158-289``
    VideoBlock): spatial single-head attention, then a temporal
    VideoTransformerBlock (1 head, d_head = C, ff_in, no context) on
    x + frame-positional embedding, merged by a learned alpha, then
    proj_out and the residual.

    NOT instantiated at the reference's shipped configuration — the SVD
    VideoDecoder runs ``time_mode="conv-only"``
    (``configs/training/svd_f_est_ctrl_simp1.yaml:144-158`` sets no
    time_mode; ``temporal_ae.py:300`` defaults conv-only, and
    ``_make_attn`` then returns plain spatial attention). Provided for
    ``time_mode="all"/"attn-only"`` parity, golden-tested vs torch.
    """
    merge_strategy: str = "learned"

    @nn.compact
    def __call__(self, x, timesteps: int = 1):
        from .layers import timestep_embedding
        from .transformer import VideoTransformerBlock

        b_t, hh, ww, c = x.shape
        x_in = x
        h = _attn_inner(x, lambda n: nn.Conv(c, (1, 1), name=n))

        frames = jnp.tile(jnp.arange(timesteps), b_t // timesteps)
        t_emb = timestep_embedding(frames, c).astype(x.dtype)
        emb = nn.Dense(c * 4, name="video_time_embed_0")(t_emb)
        emb = nn.Dense(c, name="video_time_embed_2")(nn.silu(emb))
        x_mix = h + emb[:, None, :]
        x_mix = VideoTransformerBlock(
            c, 1, c, context_dim=None, ff_in=True,
            name="time_mix_block")(x_mix, None, timesteps)
        mix = self.param("mix_factor", nn.initializers.constant(0.0), (1,))
        a = jax.nn.sigmoid(mix)[0]
        h = a * h + (1.0 - a) * x_mix
        h = h.reshape(b_t, hh, ww, c)
        return x_in + nn.Conv(c, (1, 1), name="proj_out")(h)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult,
                                name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv, as reference
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID",
                            name=f"down_{level}_downsample_conv")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = nn.silu(_gn(h, "norm_out"))
        out_c = cfg.z_channels * (2 if cfg.double_z else 1)
        return nn.Conv(out_c, (3, 3), name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    video: bool = False
    # Reference VideoDecoder time_mode (``temporal_ae.py:292-345``):
    # "conv-only" (the shipped SVD config) = temporal resblocks + final
    # time-mix conv, spatial mid attention; "all" adds VideoAttnBlock
    # mid attention; "attn-only" = temporal attention only.
    time_mode: str = "conv-only"

    @nn.compact
    def __call__(self, z, timesteps: int = 1):
        cfg = self.cfg
        temporal_res = (self.video
                        and self.time_mode not in ("attn-only",
                                                   "only-last-conv"))
        temporal_attn = (self.video
                         and self.time_mode in ("all", "attn-only"))
        temporal_out = self.video and self.time_mode != "attn-only"

        def res(name, ch):
            if temporal_res:
                blk = VideoResnetBlock(ch, cfg.video_kernel_size, name=name)
                return lambda x: blk(x, timesteps)
            blk = ResnetBlock(ch, name=name)
            return blk

        def attn(name):
            if temporal_attn:
                blk = VideoAttnBlock(name=name)
                return lambda x: blk(x, timesteps)
            return AttnBlock(name=name)

        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), name="conv_in")(z)
        h = res("mid_block_1", ch)(h)
        h = attn("mid_attn_1")(h)
        h = res("mid_block_2", ch)(h)
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = res(f"up_{level}_block_{i}", ch)(h)
            if level != 0:
                b, hh, ww, c = h.shape
                # 2x nearest via broadcast+reshape (resize lowers to a
                # slow gather/while on TPU — see layers.Upsample).
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (b, hh, 2, ww, 2, c)).reshape(
                    b, hh * 2, ww * 2, c)
                h = nn.Conv(c, (3, 3), name=f"up_{level}_upsample_conv")(h)
        h = nn.silu(_gn(h, "norm_out"))
        h = nn.Conv(cfg.out_ch, (3, 3), name="conv_out")(h)
        if temporal_out:
            bt, hh, ww, c = h.shape
            b = bt // timesteps
            h5 = h.reshape(b, timesteps, hh, ww, c)
            h5 = nn.Conv(c, tuple(cfg.video_kernel_size),
                         name="conv_out_time_mix")(h5)
            h = h5.reshape(bt, hh, ww, c)
        return h


class DiagonalGaussian:
    """Posterior from the encoder's (mean, logvar) split."""

    def __init__(self, params: jnp.ndarray):
        self.mean, logvar = jnp.split(params, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean


class AutoencoderKL(nn.Module):
    """Encoder + (Video)Decoder with quant/post-quant convs.

    ``sample_posterior=False`` == AutoencoderKLModeOnly (the conditioner's
    encoder); SVD's first stage scales latents by 0.18215 at the engine
    level, not here.
    """
    cfg: VAEConfig = VAEConfig()
    video_decoder: bool = True

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, video=self.video_decoder,
                               name="decoder")
        zc = self.cfg.z_channels
        self.quant_conv = nn.Conv(2 * zc if self.cfg.double_z else zc,
                                  (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(zc, (1, 1), name="post_quant_conv")

    def encode(self, x) -> DiagonalGaussian:
        return DiagonalGaussian(self.quant_conv(self.encoder(x)))

    def decode(self, z, timesteps: int = 1):
        return self.decoder(self.post_quant_conv(z), timesteps=timesteps)

    def __call__(self, x, timesteps: int = 1):
        post = self.encode(x)
        return self.decode(post.mode(), timesteps=timesteps), post
