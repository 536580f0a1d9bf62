"""UNet residual blocks: 2D spatial + factorized temporal (flax, NHWC).

Parity with ``sgm/modules/diffusionmodules/openaimodel.py`` ResBlock and
``video_model.py`` VideoResBlock: GroupNorm32+SiLU+conv in/out layers,
timestep-embedding projection added between them, zero-init output conv,
1x1 skip on channel change; the temporal stack is a 3D ResBlock with
kernel (3,1,1) over (T, H, W) merged through a learned AlphaBlender.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .layers import AlphaBlender, GroupNorm32


class ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        c_in = x.shape[-1]
        h = GroupNorm32(name="in_layers_0")(x)
        h = nn.Conv(self.out_channels, (3, 3), name="in_layers_2")(
            nn.silu(h))
        emb_out = nn.Dense(self.out_channels, name="emb_layers_1")(
            nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm32(name="out_layers_0")(h)
        h = nn.Conv(self.out_channels, (3, 3),
                    kernel_init=nn.initializers.zeros,
                    name="out_layers_3")(nn.silu(h))
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1),
                        name="skip_connection")(x)
        return x + h


class ResBlock3D(nn.Module):
    """Temporal ResBlock over [B, T, H, W, C] with kernel (kt, kh, kw)."""
    out_channels: int
    kernel: Sequence[int] = (3, 1, 1)

    @nn.compact
    def __call__(self, x, emb):
        # x: [B, T, H, W, C]; emb: [B, T, C_emb]
        c_in = x.shape[-1]
        h = GroupNorm32(name="in_layers_0")(x)
        h = nn.Conv(self.out_channels, tuple(self.kernel),
                    name="in_layers_2")(nn.silu(h))
        emb_out = nn.Dense(self.out_channels, name="emb_layers_1")(
            nn.silu(emb))
        h = h + emb_out[:, :, None, None, :]
        h = GroupNorm32(name="out_layers_0")(h)
        h = nn.Conv(self.out_channels, tuple(self.kernel),
                    kernel_init=nn.initializers.zeros,
                    name="out_layers_3")(nn.silu(h))
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1),
                        name="skip_connection")(x)
        return x + h


class VideoResBlock(nn.Module):
    out_channels: int
    video_kernel_size: Sequence[int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"

    @nn.compact
    def __call__(self, x, emb, num_video_frames: int,
                 image_only_indicator=None):
        # x: [(b t), H, W, C]
        x = ResBlock(self.out_channels, name="spatial")(x, emb)
        bt, hh, ww, c = x.shape
        b = bt // num_video_frames
        x5 = x.reshape(b, num_video_frames, hh, ww, c)
        emb5 = emb.reshape(b, num_video_frames, emb.shape[-1])
        h = ResBlock3D(self.out_channels, self.video_kernel_size,
                       name="time_stack")(x5, emb5)
        # AlphaBlender over [B, T, ...]: indicator [B, T] broadcasts on
        # the (b, t) leading dims — flatten to match layers.AlphaBlender.
        out = AlphaBlender(merge_strategy=self.merge_strategy,
                           name="time_mixer")(
            x5.reshape(bt, hh, ww, c), h.reshape(bt, hh, ww, c),
            image_only_indicator)
        return out
