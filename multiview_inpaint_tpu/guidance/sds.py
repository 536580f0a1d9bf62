"""Score-distillation (SDS) guidance with an inpainting diffusion prior.

Capability parity with ``gs-simp/guidance/sdi_utils.py`` (the
StableDiffusion-2-inpainting SDS used to grow coarse object geometry):

- DDPM cosine/linear beta schedule (scaled_linear 0.00085..0.012, 1000
  steps) with t sampled in [0.02, 0.98]*1000;
- 9-channel UNet input [noisy_latents(4) | mask(1) | masked_latents(4)];
- classifier-free guidance at scale **100**;
- SDS gradient w(t) = (1 - alpha_bar_t), loss =
  0.5 * ||latents - sg(latents - w (eps_hat - eps))||^2 / B — i.e. the
  gradient (eps_hat - eps) flows into the rendered image through the VAE
  encoder (``train_step``, sdi_utils.py:155-251);
- ``test_step``: full DDIM denoise from a chosen t for visualization.

The diffusion prior is injected as ``eps_model(x9, t, text_emb) -> eps``
plus VAE encode/decode fns, so any SD-inpaint-compatible backbone works
(a flax UNet2D with imported SD2 weights, or a host-side model). Pure
functions; the SDS step jits and differentiates end-to-end with the
rasterizer.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    num_steps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012

    def alphas_cumprod(self) -> jnp.ndarray:
        betas = jnp.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                             self.num_steps) ** 2
        return jnp.cumprod(1.0 - betas)


@dataclasses.dataclass(frozen=True)
class SDSConfig:
    guidance_scale: float = 100.0
    t_range: Tuple[float, float] = (0.02, 0.98)
    schedule: DDPMSchedule = DDPMSchedule()


class SDSGuidance:
    """SDS with an inpainting eps-model.

    Args:
      eps_model: (x9 [B,h,w,9], t [B], text_emb [2B,L,D]) -> eps [B,h,w,4]
        — the caller handles CFG batching: inputs are duplicated
        (uncond|cond) internally.
      vae_encode: images [B,H,W,3] in [0,1] -> latents [B,h,w,4]
        (differentiable).
      vae_decode: latents -> images.
    """

    def __init__(self, eps_model: Callable, vae_encode: Callable,
                 vae_decode: Callable, cfg: SDSConfig = SDSConfig()):
        self.eps_model = eps_model
        self.vae_encode = vae_encode
        self.vae_decode = vae_decode
        self.cfg = cfg
        self._acp = self.cfg.schedule.alphas_cumprod()

    def _eps_cfg(self, x9, t, text_embs):
        """text_embs [2, L, D] = (uncond, cond); CFG at guidance_scale."""
        b = x9.shape[0]
        x2 = jnp.concatenate([x9, x9], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        emb = jnp.concatenate([
            jnp.repeat(text_embs[0:1], b, axis=0),
            jnp.repeat(text_embs[1:2], b, axis=0)], axis=0)
        eps = self.eps_model(x2, t2, emb)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + self.cfg.guidance_scale * (eps_c - eps_u)

    def train_step(self, key: jax.Array, image: jnp.ndarray,
                   mask: jnp.ndarray, text_embs: jnp.ndarray) -> jnp.ndarray:
        """SDS loss for one rendered view.

        image [H,W,3] in [0,1] (grad flows); mask [H,W] (1 = inpaint
        region); text_embs [2, L, D].
        Returns scalar loss whose gradient w.r.t. ``image`` is the SDS
        gradient.
        """
        img = image[None]
        latents = self.vae_encode(img)  # differentiable
        h, w = latents.shape[1:3]
        mask_l = jax.image.resize(mask[None, ..., None],
                                  (1, h, w, 1), "nearest")
        masked_img = img * (1.0 - mask[None, ..., None])
        masked_latents = jax.lax.stop_gradient(self.vae_encode(masked_img))

        k1, k2 = jax.random.split(key)
        tmin = int(self.cfg.t_range[0] * self.cfg.schedule.num_steps)
        tmax = int(self.cfg.t_range[1] * self.cfg.schedule.num_steps)
        t = jax.random.randint(k1, (1,), tmin, tmax + 1)
        acp = self._acp[t][:, None, None, None]
        noise = jax.random.normal(k2, latents.shape)
        noisy = jnp.sqrt(acp) * jax.lax.stop_gradient(latents) + \
            jnp.sqrt(1 - acp) * noise
        x9 = jnp.concatenate([noisy, mask_l, masked_latents], axis=-1)
        eps_hat = jax.lax.stop_gradient(
            self._eps_cfg(x9, t.astype(jnp.float32), text_embs))
        w_t = (1.0 - acp)
        grad = w_t * (eps_hat - noise)
        target = jax.lax.stop_gradient(latents - grad)
        return 0.5 * jnp.sum((latents - target) ** 2) / latents.shape[0]

    def test_step(self, key: jax.Array, image: jnp.ndarray,
                  mask: jnp.ndarray, text_embs: jnp.ndarray,
                  start_t: float = 0.98, num_steps: int = 25
                  ) -> jnp.ndarray:
        """DDIM denoise from ``start_t`` for visualization
        (``sdi_utils.test_step``)."""
        img = image[None]
        latents = self.vae_encode(img)
        h, w = latents.shape[1:3]
        mask_l = jax.image.resize(mask[None, ..., None], (1, h, w, 1),
                                  "nearest")
        masked_latents = self.vae_encode(img * (1 - mask[None, ..., None]))
        t0 = int(start_t * self.cfg.schedule.num_steps)
        ts = jnp.linspace(t0, 1, num_steps).astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        acp0 = self._acp[t0]
        x = jnp.sqrt(acp0) * latents + jnp.sqrt(1 - acp0) * \
            jax.random.normal(k1, latents.shape)

        def step(x, i):
            t_cur = ts[i]
            t_next = jnp.where(i + 1 < num_steps, ts[i + 1], 0)
            x9 = jnp.concatenate([x, mask_l, masked_latents], axis=-1)
            eps = self._eps_cfg(x9, t_cur[None].astype(jnp.float32),
                                text_embs)
            a_cur = self._acp[t_cur]
            a_next = jnp.where(t_next > 0, self._acp[t_next], 1.0)
            x0 = (x - jnp.sqrt(1 - a_cur) * eps) / jnp.sqrt(a_cur)
            x = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
            return x, None

        x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
        return jnp.clip(self.vae_decode(x)[0], 0.0, 1.0)
