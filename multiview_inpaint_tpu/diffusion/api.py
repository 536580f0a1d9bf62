"""High-level sampling API — parity with ``sgm/inference/api.py``.

The reference exposes ``SamplingPipeline`` with a ``Sampler`` enum and
``SamplingParams`` over its model specs; this is the same surface for our
engine: pick a sampler by name, configure discretization/guider by
params, run image-set or video sampling in one call. Everything jits.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import edm, samplers
from .guiders import (IdentityGuider, LinearPredictionGuider,
                      TrianglePredictionGuider, VanillaCFG)


class Sampler(str, enum.Enum):
    EULER_EDM = "EulerEDMSampler"
    HEUN_EDM = "HeunEDMSampler"
    EULER_ANCESTRAL = "EulerAncestralSampler"
    DPMPP2M = "DPMPP2MSampler"
    DPMPP2S_ANCESTRAL = "DPMPP2SAncestralSampler"
    LINEAR_MULTISTEP = "LinearMultistepSampler"
    EULER_EDM_BLENDED = "EulerEDMSampler2"
    EULER_EDM_INVERSION = "EulerEDMSampler3"


class Discretization(str, enum.Enum):
    EDM = "EDMDiscretization"
    LEGACY_DDPM = "LegacyDDPMDiscretization"


class Guider(str, enum.Enum):
    IDENTITY = "IdentityGuider"
    VANILLA = "VanillaCFG"
    LINEAR_PREDICTION = "LinearPredictionGuider"
    TRIANGLE_PREDICTION = "TrianglePredictionGuider"


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    sampler: Sampler = Sampler.EULER_EDM
    discretization: Discretization = Discretization.EDM
    guider: Guider = Guider.LINEAR_PREDICTION
    steps: int = 25
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    scale: float = 2.5          # cfg max scale
    min_scale: float = 1.0
    num_frames: int = 14
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0


def build_sigmas(p: SamplingParams) -> jnp.ndarray:
    if p.discretization == Discretization.LEGACY_DDPM:
        s = edm.legacy_ddpm_sigmas(p.steps)
    else:
        s = edm.edm_sigmas(p.steps, p.sigma_min, p.sigma_max, p.rho)
    return jnp.concatenate([s, jnp.zeros((1,))])


def build_guider(p: SamplingParams,
                 additional_cond_keys=("control_hint",)):
    if p.guider == Guider.IDENTITY:
        return IdentityGuider()
    if p.guider == Guider.VANILLA:
        return VanillaCFG(scale=p.scale,
                          additional_cond_keys=tuple(additional_cond_keys))
    if p.guider == Guider.TRIANGLE_PREDICTION:
        return TrianglePredictionGuider(
            max_scale=p.scale, min_scale=p.min_scale,
            num_frames=p.num_frames,
            additional_cond_keys=tuple(additional_cond_keys))
    return LinearPredictionGuider(
        max_scale=p.scale, min_scale=p.min_scale, num_frames=p.num_frames,
        additional_cond_keys=tuple(additional_cond_keys))


class SamplingPipeline:
    """One-call sampling over any denoise_fn(x, sigma_vec, cond)."""

    def __init__(self, denoise_fn, params: SamplingParams = SamplingParams(),
                 inv_denoise_fn=None):
        self.denoise_fn = denoise_fn
        self.inv_denoise_fn = inv_denoise_fn
        self.params = params
        self.guider = build_guider(params)
        self.sigmas = build_sigmas(params)

    def sample(self, key: jax.Array, shape, cond: Dict,
               uc: Optional[Dict] = None, z: Optional[jnp.ndarray] = None,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        p = self.params
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, shape)
        kw = dict(guider=self.guider, key=k2, s_churn=p.s_churn,
                  s_tmin=p.s_tmin, s_tmax=p.s_tmax, s_noise=p.s_noise)
        if p.sampler == Sampler.HEUN_EDM:
            return samplers.heun_edm_sample(self.denoise_fn, x, cond, uc,
                                            self.sigmas, **kw)
        if p.sampler == Sampler.EULER_ANCESTRAL:
            return samplers.euler_ancestral_sample(
                self.denoise_fn, x, cond, uc, self.sigmas,
                guider=self.guider, key=k2, s_noise=p.s_noise)
        if p.sampler == Sampler.DPMPP2M:
            return samplers.dpmpp2m_sample(self.denoise_fn, x, cond, uc,
                                           self.sigmas, guider=self.guider)
        if p.sampler == Sampler.DPMPP2S_ANCESTRAL:
            return samplers.dpmpp2s_ancestral_sample(
                self.denoise_fn, x, cond, uc, self.sigmas,
                guider=self.guider, key=k2, s_noise=p.s_noise)
        if p.sampler == Sampler.LINEAR_MULTISTEP:
            return samplers.lms_sample(self.denoise_fn, x, cond, uc,
                                       self.sigmas, guider=self.guider)
        if p.sampler == Sampler.EULER_EDM_BLENDED:
            assert z is not None and mask is not None
            return samplers.euler_edm_sample_blended(
                self.denoise_fn, x, cond, uc, self.sigmas, z, mask, **kw)
        if p.sampler == Sampler.EULER_EDM_INVERSION:
            assert z is not None and mask is not None
            assert self.inv_denoise_fn is not None
            return samplers.euler_edm_sample_inversion(
                self.denoise_fn, self.inv_denoise_fn, x, cond, uc,
                self.sigmas, z, mask, guider=self.guider,
                inv_guider=IdentityGuider(), key=k2)
        return samplers.euler_edm_sample(self.denoise_fn, x, cond, uc,
                                         self.sigmas, **kw)
