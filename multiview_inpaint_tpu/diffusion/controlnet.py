"""Video ControlNet — the paper's control branch (flax.linen, NHWC).

Parity with ``models/csvd.py:119-498`` (ControlNet): a clone of the
VideoUNet *encoder + middle* whose hidden states pass through
zero-initialized 1x1 convs to become 13 residuals, plus the
``input_hint_block`` that embeds the 7-channel control hint
(est-depth(3) + box mask(1) + bg-masked render(3)) at full resolution
down to the latent grid: channels 7->16->32->96->256 with three stride-2
convs, then a zero conv to model_channels.

The trunk reuses :class:`VideoUNet` with ``extract_features=True`` (its
own parameters — initialized from the UNet weights at setup, exactly like
``init_from_unet``).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from .unet import UNetConfig, VideoUNet


class ControlNet(nn.Module):
    cfg: UNetConfig
    hint_channels: int = 7

    @nn.compact
    def __call__(self, x, hint, timesteps, context=None, y=None,
                 num_video_frames: int = 1,
                 image_only_indicator=None) -> List[jnp.ndarray]:
        cfg = self.cfg
        # input_hint_block: 7 -> 16 -> 16 -> 32 -> 32 -> 96 -> 96 -> 256
        # with stride 2 at the channel jumps, then zero conv to model ch.
        h = hint
        chans = [16, 16, 32, 32, 96, 96, 256]
        strides = [1, 1, 2, 1, 2, 1, 2]
        for i, (c, s) in enumerate(zip(chans, strides)):
            # Explicit pad 1 (not SAME): torch stride-2 conv parity —
            # see layers.Downsample.
            h = nn.Conv(c, (3, 3), strides=(s, s),
                        padding=((1, 1), (1, 1)),
                        name=f"input_hint_block_{2 * i}")(h)
            h = nn.silu(h)
        guided_hint = nn.Conv(cfg.model_channels, (3, 3),
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              name="input_hint_block_14")(h)

        feats = VideoUNet(cfg, name="trunk")(
            x, timesteps, context=context, y=y,
            num_video_frames=num_video_frames,
            image_only_indicator=image_only_indicator,
            extract_features=True, hint=guided_hint)

        outs = []
        for i, f in enumerate(feats[:-1]):
            outs.append(nn.Conv(f.shape[-1], (1, 1),
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                name=f"zero_convs_{i}_0")(f))
        outs.append(nn.Conv(feats[-1].shape[-1], (1, 1),
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            name="middle_block_out_0")(feats[-1]))
        return outs
