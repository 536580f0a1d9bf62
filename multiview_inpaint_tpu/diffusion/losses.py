"""Diffusion training losses (pure functions).

Parity with ``sgm/modules/diffusionmodules/loss.py``:
- :func:`standard_diffusion_loss` — StandardDiffusionLoss (per-sample
  sigma, weighted L1/L2 against the clean latents).
- :func:`inpaint_diffusion_loss` — InpaintDiffusionLoss (:148-214): one
  sigma per *video* shared across its frames; crossattn/concat conditioning
  repeated per frame; additional cond keys (control_hint) passed through.
- :func:`warp_consistency_loss` — the InpaintDiffusionLoss2 extra term
  (:233-376): gathers each denoised frame at ``uv_ind`` (the pixel indices
  that project into the previous frame via the coarse depth) and penalizes
  the masked difference to the next frame.

The denoiser call is injected as ``denoise_fn(noised, sigmas, cond)`` so
these functions stay engine-agnostic and jit cleanly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from . import edm

WEIGHTINGS = {
    "edm": edm.edm_weighting,
    "v": edm.v_weighting,
    "eps": edm.eps_weighting,
    "unit": edm.unit_weighting,
}


def _bdims(s, x):
    return s.reshape(s.shape + (1,) * (x.ndim - 1))


def _per_sample(loss_type: str, model_output, target, w):
    diff = model_output - target
    if loss_type == "l2":
        e = w * diff * diff
    elif loss_type == "l1":
        e = w * jnp.abs(diff)
    else:
        raise NotImplementedError(loss_type)
    return jnp.mean(e.reshape(target.shape[0], -1), axis=1)


def standard_diffusion_loss(denoise_fn: Callable, key: jax.Array,
                            latents: jnp.ndarray, cond: Dict,
                            loss_type: str = "l2",
                            weighting: str = "edm",
                            sigma_data: float = 1.0,
                            p_mean: float = 1.0,
                            p_std: float = 1.6) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    sigmas = edm.edm_sigma_sample(k1, (latents.shape[0],), p_mean, p_std)
    noise = jax.random.normal(k2, latents.shape, latents.dtype)
    noised = latents + noise * _bdims(sigmas, latents)
    out = denoise_fn(noised, sigmas, cond)
    w = WEIGHTINGS[weighting](sigmas) if weighting != "edm" else \
        edm.edm_weighting(sigmas, sigma_data)
    return _per_sample(loss_type, out, latents, _bdims(w, latents))


def inpaint_diffusion_loss(denoise_fn: Callable, key: jax.Array,
                           latents: jnp.ndarray, cond: Dict,
                           num_video_frames: int,
                           loss_type: str = "l2",
                           weighting: str = "edm",
                           sigma_data: float = 1.0,
                           p_mean: float = 1.0, p_std: float = 1.6,
                           warp: Optional[Dict] = None) -> jnp.ndarray:
    """latents [(b t), h, w, c]; one sigma per video.

    ``warp``: optional {"hit_map": [(t-1), h, w], "uv_ind": [(t-1), h*w*c]}
    enabling the InpaintDiffusionLoss2 warp-consistency term.
    """
    bt = latents.shape[0]
    b = bt // num_video_frames
    k1, k2 = jax.random.split(key)
    sig_b = edm.edm_sigma_sample(k1, (b,), p_mean, p_std)
    sigmas = jnp.repeat(sig_b, num_video_frames)
    noise = jax.random.normal(k2, latents.shape, latents.dtype)
    noised = latents + noise * _bdims(sigmas, latents)
    out = denoise_fn(noised, sigmas, cond)
    w = WEIGHTINGS[weighting](sigmas) if weighting != "edm" else \
        edm.edm_weighting(sigmas, sigma_data)
    w_bc = _bdims(w, latents)
    loss = _per_sample(loss_type, out, latents, w_bc)
    if warp is not None:
        loss = loss + warp_consistency_loss(out, warp["hit_map"],
                                            warp["uv_ind"], w_bc,
                                            loss_type)
    return loss


def warp_consistency_loss(model_output: jnp.ndarray, hit_map: jnp.ndarray,
                          uv_ind: jnp.ndarray, w_bc: jnp.ndarray,
                          loss_type: str = "l2") -> jnp.ndarray:
    """Cross-frame consistency on the denoised latents.

    model_output [(t), h, w, c] (single video); uv_ind flat indices into
    each previous frame's h*w grid per channel; hit_map [(t-1), h, w].
    Returns per-frame additions ([t], zero for frame 0).
    """
    t, h, w, c = model_output.shape
    prev = model_output[:t - 1].transpose(0, 3, 1, 2).reshape(
        t - 1, c, h * w)
    ind = uv_ind.reshape(t - 1, c, h * w)
    projected = jnp.take_along_axis(prev, ind, axis=-1).reshape(
        t - 1, c, h, w).transpose(0, 2, 3, 1)
    err = (projected - model_output[1:]) * hit_map[..., None]
    if loss_type == "l2":
        e = w_bc[1:] * err * err
    else:
        e = w_bc[1:] * jnp.abs(err)
    add = jnp.mean(e.reshape(t - 1, -1), axis=1)
    return jnp.concatenate([jnp.zeros((1,), add.dtype), add])
