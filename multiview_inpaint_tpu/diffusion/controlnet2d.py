"""2D ControlNet (depth-conditioned) for the candidate-inpainting stage.

The reference's ``ctrl_inpaint.py`` drives HF's SD-1.5-inpainting +
ControlNet-depth; this is the same control architecture over our
:class:`UNet2D`: an encoder-clone trunk, the standard
16->32->96->256 hint stack (3-channel depth hint) and zero convs per
feature, importable from torch ControlNet checkpoints via
``weights_io.import_controlnet(..., video=False key space)``.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from .unet2d import UNet2D, UNet2DConfig


class ControlNet2D(nn.Module):
    cfg: UNet2DConfig
    hint_channels: int = 3

    @nn.compact
    def __call__(self, x, hint, timesteps, context=None) -> List[jnp.ndarray]:
        cfg = self.cfg
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
        feats = UNet2D(cfg, name="trunk")(
            x, timesteps, context=context, extract_features=True,
            hint=guided_hint)
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
