"""ControlNet gradient-flow regression test.

At fresh init the UNet output conv is zero (reference parity), so every
upstream gradient is legitimately zero. With a non-zero output conv (the
pretrained situation), gradients MUST reach the ControlNet's zero convs
and hint block — this is what training relies on.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from multiview_inpaint_tpu.diffusion.clip_vit import TINY_VIT
from multiview_inpaint_tpu.diffusion.engine import (EngineConfig, SVDEngine,
                                                    init_engine)
from multiview_inpaint_tpu.diffusion.unet import UNetConfig
from multiview_inpaint_tpu.diffusion.vae import VAEConfig


def test_controlnet_grads_flow_with_pretrained_like_out():
    vit = dataclasses.replace(TINY_VIT, output_dim=16)
    cfg = EngineConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        attention_resolutions=(1,), channel_mult=(1, 2),
                        num_head_channels=16, context_dim=16),
        vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        vit=vit, num_frames=2, num_steps=2)
    eng = SVDEngine(cfg)
    state = init_engine(cfg, jax.random.key(0), latent_hw=(8, 8))

    # Simulate pretrained weights: non-zero output conv + zero convs.
    rng = np.random.default_rng(0)
    flat = dict(flatten_dict(state.unet))
    k = ("out_2", "kernel")
    flat[k] = jnp.asarray(rng.normal(scale=0.1,
                                     size=flat[k].shape), jnp.float32)
    state = dataclasses.replace(state, unet=unflatten_dict(flat))
    cn_flat = dict(flatten_dict(state.controlnet))
    for key in list(cn_flat):
        if (key[0].startswith("zero_convs")
                or key[0] in ("middle_block_out_0", "input_hint_block_14")):
            cn_flat[key] = jnp.asarray(
                rng.normal(scale=0.01, size=cn_flat[key].shape), jnp.float32)
    state = dataclasses.replace(state, controlnet=unflatten_dict(cn_flat))

    t = cfg.num_frames
    x = jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32),
        "crossattn": jnp.asarray(rng.normal(size=(t, 1, 16)), jnp.float32),
        "vector": jnp.asarray(rng.normal(size=(t, 768)), jnp.float32),
        "control_hint": jnp.asarray(rng.normal(size=(t, 64, 64, 7)),
                                    jnp.float32),
    }

    def f(cn):
        st = dataclasses.replace(state, controlnet=cn)
        out = eng.apply_model(st, x, jnp.ones((t,)), cond)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(state.controlnet)
    sums = {}
    for key, v in flatten_dict(g).items():
        sums.setdefault(key[0], 0.0)
        sums[key[0]] += float(jnp.abs(v).sum())
    # zero convs, trunk and the hint stack all receive gradient
    assert sums["zero_convs_0_0"] > 0
    assert sums["middle_block_out_0"] > 0
    assert sums["trunk"] > 0
    assert sums["input_hint_block_0"] > 0
