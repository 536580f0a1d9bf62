"""Frame-sharded (sequence-parallel) SVD inference on the virtual mesh:
the annotated forward and a full guided sampler run must match the
single-device results (reference samples on one GPU; this is the TPU
scaling story — frames shard, temporal layers reshard via GSPMD)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.diffusion import edm, samplers
from multiview_inpaint_tpu.diffusion.clip_vit import TINY_VIT
from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                    SVDEngine,
                                                    init_engine)
from multiview_inpaint_tpu.diffusion.guiders import (
    LinearPredictionGuider)
from multiview_inpaint_tpu.diffusion.unet import UNetConfig
from multiview_inpaint_tpu.diffusion.vae import VAEConfig
from multiview_inpaint_tpu.parallel import make_mesh
from multiview_inpaint_tpu.parallel.svd_inference_parallel import (
    frame_sharded_apply_model, make_frame_sharded_denoiser)


@pytest.fixture(scope="module")
def sp_engine():
    cfg = EngineConfig(
        unet=UNetConfig(in_channels=8, model_channels=32,
                        out_channels=4, num_res_blocks=1,
                        attention_resolutions=(1,), channel_mult=(1, 2),
                        num_head_channels=16, context_dim=16,
                        adm_in_channels=768),
        vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                      z_channels=4),
        vit=dataclasses.replace(TINY_VIT, output_dim=16),
        num_frames=4, num_steps=3)
    eng = SVDEngine(cfg)
    state = init_engine(cfg, jax.random.key(0), latent_hw=(8, 8))
    return eng, state, cfg


def _cond(t, rng):
    return {
        "concat": jnp.asarray(rng.normal(0, 1, (t, 8, 8, 4)),
                              jnp.float32),
        "crossattn": jnp.asarray(rng.normal(0, 1, (t, 1, 16)),
                                 jnp.float32),
        "vector": jnp.asarray(rng.normal(0, 1, (t, 768)), jnp.float32),
        "control_hint": jnp.asarray(rng.normal(0, 1, (t, 64, 64, 7)),
                                    jnp.float32),
    }


def test_frame_sharded_apply_model_matches(sp_engine):
    eng, state, cfg = sp_engine
    t = cfg.num_frames
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (t, 8, 8, 4)), jnp.float32)
    cond = _cond(t, rng)
    t_noise = jnp.full((t,), 0.7, jnp.float32)
    want = eng.apply_model(state, x, t_noise, cond)
    mesh = make_mesh(4)
    got = frame_sharded_apply_model(eng, state, mesh, x, t_noise, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_frame_sharded_guided_sampling_matches(sp_engine):
    """A full guided Euler-EDM trajectory through the frame-sharded
    denoiser == the single-device denoiser (same key/sigmas)."""
    eng, state, cfg = sp_engine
    t = cfg.num_frames
    rng = np.random.default_rng(1)
    cond, uc = _cond(t, rng), _cond(t, rng)
    sigmas = jnp.concatenate([edm.edm_sigmas(3, 0.002, 80.0),
                              jnp.zeros((1,))])
    guider = LinearPredictionGuider(max_scale=2.5, min_scale=1.0,
                                    num_frames=t)
    x0 = jax.random.normal(jax.random.key(2), (t, 8, 8, 4))
    want = samplers.euler_edm_sample(eng.denoise_fn(state), x0, cond,
                                     uc, sigmas, guider=guider,
                                     key=jax.random.key(3))
    mesh = make_mesh(4)
    sp_denoise = make_frame_sharded_denoiser(eng, state, mesh)
    got = samplers.euler_edm_sample(sp_denoise, x0, cond, uc, sigmas,
                                    guider=guider,
                                    key=jax.random.key(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)
