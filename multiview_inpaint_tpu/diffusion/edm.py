"""EDM math: discretization, scalings, sigma sampling, loss weighting.

Pure-function parity with ``sgm/modules/diffusionmodules/{discretizer,
denoiser_scaling,sigma_sampling,loss_weighting}.py`` at the reference
configuration: EDMDiscretization(sigma_min=0.002, sigma_max=700, rho=7),
VScalingWithEDMcNoise (c_noise = 0.25 log sigma), EDMSampling lognormal
(p_mean 1.0, p_std 1.6), EDMWeighting(sigma_data=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edm_sigmas(n: int, sigma_min: float = 0.002, sigma_max: float = 700.0,
               rho: float = 7.0) -> jnp.ndarray:
    """n sigmas, descending, Karras rho-schedule; append 0 at the end the
    way samplers consume it (prepare_sampling_loop appends zero)."""
    ramp = jnp.linspace(0, 1, n)
    min_r = sigma_min ** (1 / rho)
    max_r = sigma_max ** (1 / rho)
    return (max_r + ramp * (min_r - max_r)) ** rho


def legacy_ddpm_sigmas(n: int, num_timesteps: int = 1000,
                       linear_start: float = 0.00085,
                       linear_end: float = 0.012) -> jnp.ndarray:
    betas = jnp.linspace(linear_start ** 0.5, linear_end ** 0.5,
                         num_timesteps) ** 2
    alphas_cum = jnp.cumprod(1.0 - betas)
    all_sigmas = jnp.sqrt((1 - alphas_cum) / alphas_cum)
    idx = jnp.linspace(0, num_timesteps - 1, n).round().astype(jnp.int32)
    return jnp.flip(all_sigmas[idx])


# --- denoiser scalings: return (c_skip, c_out, c_in, c_noise) -----------

def v_scaling_edm_cnoise(sigma):
    c_skip = 1.0 / (sigma ** 2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def edm_scaling(sigma, sigma_data: float = 0.5):
    c_skip = sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma ** 2 + sigma_data ** 2)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + sigma_data ** 2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def eps_scaling(sigma):
    ones = jnp.ones_like(sigma)
    return ones, -sigma, 1.0 / jnp.sqrt(sigma ** 2 + 1.0), sigma


SCALINGS = {
    "v_edm_cnoise": v_scaling_edm_cnoise,
    "edm": edm_scaling,
    "eps": eps_scaling,
}


def denoise(net_apply, x, sigma, scaling="v_edm_cnoise", **net_kwargs):
    """D(x, sigma) = net(x*c_in, c_noise)*c_out + x*c_skip.

    ``sigma`` [B] broadcasts over x's trailing dims.
    """
    c_skip, c_out, c_in, c_noise = SCALINGS[scaling](sigma)
    bcast = (...,) + (None,) * (x.ndim - 1)
    out = net_apply(x * c_in[bcast], c_noise)
    return out * c_out[bcast] + x * c_skip[bcast]


def raw_net_out(net_apply, x, sigma, scaling="v_edm_cnoise", **net_kwargs):
    """The denoiser's ``inv_sample``: raw network output (used by the
    DDIM-style inversion sampler, ``denoiser.py:40-57``)."""
    _, _, c_in, c_noise = SCALINGS[scaling](sigma)
    bcast = (...,) + (None,) * (x.ndim - 1)
    return net_apply(x * c_in[bcast], c_noise)


# --- sigma sampling and loss weighting ----------------------------------

def edm_sigma_sample(key, shape, p_mean: float = 1.0, p_std: float = 1.6):
    return jnp.exp(p_mean + p_std * jax.random.normal(key, shape))


def edm_weighting(sigma, sigma_data: float = 1.0):
    return (sigma ** 2 + sigma_data ** 2) / (sigma * sigma_data) ** 2


def v_weighting(sigma):
    return edm_weighting(sigma, sigma_data=1.0)


def eps_weighting(sigma):
    return sigma ** -2.0


def unit_weighting(sigma):
    return jnp.ones_like(sigma)
