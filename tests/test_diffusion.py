"""Diffusion stack tests: EDM math goldens, samplers on analytic denoisers,
tiny-config engine wiring (UNet + ControlNet + VAE + conditioning)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.diffusion import edm, guiders, samplers
from multiview_inpaint_tpu.diffusion.clip_vit import TINY_VIT
from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                    EngineState, SVDEngine,
                                                    init_engine)
from multiview_inpaint_tpu.diffusion.unet import UNetConfig
from multiview_inpaint_tpu.diffusion.vae import VAEConfig


# ---------- EDM math ------------------------------------------------------

def test_edm_sigmas_schedule():
    s = np.asarray(edm.edm_sigmas(25, 0.002, 700.0, 7.0))
    assert s[0] == pytest.approx(700.0, rel=1e-5)
    assert s[-1] == pytest.approx(0.002, rel=1e-5)
    assert np.all(np.diff(s) < 0)
    # Karras midpoint formula check
    mid = (700 ** (1 / 7) + 0.5 * (0.002 ** (1 / 7) - 700 ** (1 / 7))) ** 7
    assert s[12] == pytest.approx(mid, rel=1e-4)


def test_v_scaling():
    sigma = jnp.asarray([0.5, 2.0])
    c_skip, c_out, c_in, c_noise = edm.v_scaling_edm_cnoise(sigma)
    np.testing.assert_allclose(c_skip, 1 / (sigma ** 2 + 1), rtol=1e-6)
    np.testing.assert_allclose(c_out, -sigma / jnp.sqrt(sigma ** 2 + 1),
                               rtol=1e-6)
    np.testing.assert_allclose(c_noise, 0.25 * jnp.log(sigma), rtol=1e-6)


def test_denoise_identity_when_net_zero():
    # net = 0 -> D(x) = x * c_skip
    x = jnp.ones((2, 4, 4, 3))
    sigma = jnp.asarray([1.0, 3.0])
    out = edm.denoise(lambda xs, cn: jnp.zeros_like(xs), x, sigma)
    expect = x * (1 / (sigma ** 2 + 1))[:, None, None, None]
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_edm_weighting():
    s = jnp.asarray([0.5, 1.0, 2.0])
    np.testing.assert_allclose(edm.edm_weighting(s, 1.0),
                               (s ** 2 + 1) / s ** 2, rtol=1e-6)


# ---------- guiders -------------------------------------------------------

def test_vanilla_cfg():
    g = guiders.VanillaCFG(scale=3.0)
    x = jnp.ones((2, 4))
    c = {"vector": jnp.ones((2, 8)), "crossattn": jnp.ones((2, 1, 8))}
    uc = {"vector": jnp.zeros((2, 8)), "crossattn": jnp.zeros((2, 1, 8))}
    gx, gs, gc = g.prepare(x, jnp.ones(2), c, uc)
    assert gx.shape == (4, 4) and gc["vector"].shape == (4, 8)
    out = jnp.concatenate([jnp.zeros((2, 4)), jnp.ones((2, 4))])
    np.testing.assert_allclose(g.combine(out, None), 3.0)


def test_linear_prediction_guider_scales():
    g = guiders.LinearPredictionGuider(max_scale=2.5, min_scale=1.0,
                                       num_frames=4)
    # x_u = 0, x_c = 1 -> per-frame output equals the scale ramp
    out = jnp.concatenate([jnp.zeros((4, 2)), jnp.ones((4, 2))])
    got = np.asarray(g.combine(out, None))
    np.testing.assert_allclose(got[:, 0], np.linspace(1.0, 2.5, 4),
                               rtol=1e-6)


# ---------- samplers on analytic denoisers --------------------------------

def _sigmas(n=15, smax=80.0):
    return jnp.concatenate([edm.edm_sigmas(n, 0.002, smax),
                            jnp.zeros((1,))])


def test_euler_edm_converges_to_target():
    """Perfect denoiser D(x)=target => sampler returns ~target."""
    target = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(1), target.shape)
    out = samplers.euler_edm_sample(denoise_fn, x0, {}, None, _sigmas())
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=0.05)


def test_latent_dump_hook(tmp_path):
    """latent_dump writes one npy per sampler step + the sigma ladder
    (the reference EDMSampler3's np.save debugging, sampling.py:271-354),
    and unregistering restores dump-free sampling."""
    target = jnp.zeros((1, 4, 4, 2))

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(1), target.shape)
    sig = _sigmas(5)
    d = tmp_path / "latents"
    with samplers.latent_dump(str(d)) as dumper:
        samplers.euler_edm_sample(denoise_fn, x0, {}, None, sig)
    files = sorted(p.name for p in d.glob("latent_*_euler.npy"))
    assert len(files) == 5  # one per step
    assert dumper.i == 5
    lad = np.load(d / "latent_sigmas.npy")
    assert lad.shape == (5,) and lad[0] > lad[-1]
    last = np.load(d / files[-1])
    assert last.shape == x0.shape
    # hook is cleared afterwards: no new files
    samplers.euler_edm_sample(denoise_fn, x0, {}, None, sig)
    assert len(list(d.glob("latent_*_euler.npy"))) == 5


def test_heun_more_accurate_than_euler():
    """Linear-in-sigma denoiser: D(x) = x/2. ODE solvable; Heun should
    land closer to the exact solution than Euler with few steps."""
    x0 = jnp.ones((1, 4, 4, 2))

    def denoise_fn(x, s, c):
        return x / 2

    sig = _sigmas(6, smax=10.0)
    e = samplers.euler_edm_sample(denoise_fn, x0, {}, None, sig)
    h = samplers.heun_edm_sample(denoise_fn, x0, {}, None, sig)
    # exact: dx/dsigma = (x - x/2)/sigma = x/(2 sigma)
    # => x(sigma) = x(s0) * sqrt(sigma/s0); at sigma->0: x=0.
    assert np.abs(np.asarray(h)).mean() < np.abs(np.asarray(e)).mean()


def test_blended_sampler_keeps_background():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    mask = jnp.zeros((2, 8, 8, 4)).at[:, :4].set(1.0)
    target = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(2), z.shape)
    out = samplers.euler_edm_sample_blended(
        denoise_fn, x0, {}, None, _sigmas(), z, mask)
    out = np.asarray(out)
    # masked region converged to target; background stays z
    # (final step blends noised_z at sigma~0.002 => ~z)
    np.testing.assert_allclose(out[:, :4], np.asarray(target)[:, :4],
                               atol=0.05)


def test_inversion_sampler_runs():
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    mask = jnp.ones_like(z)

    def denoise_fn(x, s, c):
        return x * 0.5

    def inv_denoise_fn(x, s, c):
        return x * 0.1

    x0 = jax.random.normal(jax.random.key(3), z.shape)
    out = samplers.euler_edm_sample_inversion(
        denoise_fn, inv_denoise_fn, x0, {}, None, _sigmas(8), z, mask)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dpmpp2m_converges():
    target = jnp.asarray(np.random.default_rng(5).normal(size=(1, 4, 4, 2)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(4), target.shape)
    out = samplers.dpmpp2m_sample(denoise_fn, x0, {}, None, _sigmas())
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=0.05)


def test_unipc_converges():
    target = jnp.asarray(np.random.default_rng(6).normal(size=(1, 4, 4, 2)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(6), target.shape)
    out = samplers.unipc_sample(denoise_fn, x0, {}, None, _sigmas())
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=0.05)


def test_unipc_vs_dpmpp2m_on_analytic_ode():
    """Gaussian prior N(mu, s^2 I): the probability-flow ODE has the
    closed form x(0) = mu + sqrt(s^2/(s^2+smax^2)) (x(smax) - mu), so
    solver accuracy is measurable exactly. At 10 steps the UniPC
    corrector must (a) beat plain Euler by a wide margin, (b) be at
    least as accurate as DPM++(2M) (their predictors coincide at
    bh2/order 2 — the corrector is the difference), and (c) actually
    engage (output differs from DPM++(2M))."""
    rng = np.random.default_rng(7)
    mu = jnp.asarray(rng.normal(size=(1, 6, 6, 3)), jnp.float32)
    s2 = 0.7 ** 2
    smax = 20.0

    def denoise_fn(x, sig, c):
        sg = (sig.reshape(-1, 1, 1, 1) ** 2)
        return (s2 * x + sg * mu) / (s2 + sg)

    sig = jnp.concatenate([edm.edm_sigmas(20, 0.002, smax),
                           jnp.zeros((1,))])
    x_start = jax.random.normal(jax.random.key(2), mu.shape)
    # Samplers scale their input by sqrt(1+smax^2) (prepare_x); the ODE
    # is integrated from that effective state.
    x_eff = x_start * np.sqrt(1.0 + smax ** 2)
    exact = mu + np.sqrt(s2 / (s2 + smax ** 2)) * (x_eff - mu)

    def err(fn):
        out = fn(denoise_fn, x_start, {}, None, sig)
        return float(jnp.abs(out - exact).max()), out

    e_euler, _ = err(samplers.euler_edm_sample)
    e_dpm, o_dpm = err(samplers.dpmpp2m_sample)
    e_uni, o_uni = err(samplers.unipc_sample)
    # measured at 20 steps: euler 0.185, dpmpp 0.0448, unipc 0.0234 —
    # the corrector roughly halves the multistep error.
    assert e_uni < 0.25 * e_euler, (e_uni, e_euler)
    assert e_uni < e_dpm, (e_uni, e_dpm)
    assert float(jnp.abs(o_uni - o_dpm).max()) > 1e-6  # corrector on


# ---------- tiny engine wiring --------------------------------------------

TINY = EngineConfig(
    unet=UNetConfig(in_channels=8, model_channels=32, out_channels=4,
                    num_res_blocks=1, attention_resolutions=(1,),
                    channel_mult=(1, 2), num_head_channels=16,
                    context_dim=16, adm_in_channels=768),
    vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4),
    vit=TINY_VIT._replace(output_dim=16) if hasattr(TINY_VIT, "_replace")
    else TINY_VIT,
    num_frames=3, num_steps=4,
)


@pytest.fixture(scope="module")
def tiny_engine():
    import dataclasses
    vit = dataclasses.replace(TINY_VIT, output_dim=16)
    cfg = dataclasses.replace(TINY, vit=vit)
    eng = SVDEngine(cfg)
    state = init_engine(cfg, jax.random.key(0), latent_hw=(8, 8))
    return eng, state, cfg


def test_engine_apply_model_shapes(tiny_engine):
    eng, state, cfg = tiny_engine
    t = cfg.num_frames
    x = jnp.zeros((t, 8, 8, 4))
    cond = {
        "concat": jnp.zeros((t, 8, 8, 4)),
        "crossattn": jnp.zeros((t, 1, 16)),
        "vector": jnp.zeros((t, 768)),
        "control_hint": jnp.zeros((t, 64, 64, 7)),
    }
    out = eng.apply_model(state, x, jnp.zeros((t,)), cond)
    assert out.shape == (t, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_controlnet_init_from_unet(tiny_engine):
    eng, state, cfg = tiny_engine
    # trunk conv weights equal unet weights after init_from_unet
    u = state.unet["input_blocks_0_0"]["kernel"]
    c = state.controlnet["trunk"]["input_blocks_0_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(u), np.asarray(c))


def test_zero_controlnet_is_identity(tiny_engine):
    """Fresh zero convs => control residuals are 0 => output equals the
    plain UNet (the ControlNet starting point)."""
    eng, state, cfg = tiny_engine
    t = cfg.num_frames
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32),
        "crossattn": jnp.asarray(rng.normal(size=(t, 1, 16)), jnp.float32),
        "vector": jnp.asarray(rng.normal(size=(t, 768)), jnp.float32),
        "control_hint": jnp.asarray(rng.normal(size=(t, 64, 64, 7)),
                                    jnp.float32),
    }
    with_ctrl = eng.apply_model(state, x, jnp.ones((t,)), cond)
    ind = jnp.zeros((1, t))
    xc = jnp.concatenate([x, cond["concat"]], axis=-1)
    plain = eng.unet.apply({"params": state.unet}, xc, jnp.ones((t,)),
                           cond["crossattn"], cond["vector"],
                           num_video_frames=t, image_only_indicator=ind)
    np.testing.assert_allclose(np.asarray(with_ctrl), np.asarray(plain),
                               atol=1e-6)


def test_engine_sample_and_loss(tiny_engine):
    eng, state, cfg = tiny_engine
    t = cfg.num_frames
    # tiny VAE downsamples 2x -> cond frames 16x16 give 8x8 concat
    # latents; the hint block always downsamples 8x -> hint at 64x64.
    batch = {
        "cond_frames_without_noise": jnp.zeros((1, 16, 16, 3)),
        "cond_frames": jnp.zeros((1, 16, 16, 3)),
        "fps_id": jnp.asarray([6.0]),
        "motion_bucket_id": jnp.asarray([127.0]),
        "cond_aug": jnp.asarray([0.0]),
        "control_hint": jnp.zeros((t, 64, 64, 7)),
    }
    cond = eng.prepare_cond(state, batch, key=jax.random.key(1))
    uc = eng.prepare_cond(state, batch, unconditional=True)
    uc["control_hint"] = batch["control_hint"]
    assert cond["vector"].shape == (t, 768)
    assert cond["concat"].shape[0] == t
    out = eng.sample(state, jax.random.key(2), cond, uc,
                     latent_shape=(t, 8, 8, 4), num_steps=2)
    assert out.shape == (t, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    latents = jnp.zeros((t, 8, 8, 4))
    loss = eng.loss(state, jax.random.key(3), latents, cond)
    assert np.isfinite(float(loss))


def test_vae_roundtrip_shapes(tiny_engine):
    eng, state, cfg = tiny_engine
    x = jnp.zeros((2, 32, 32, 3))
    z = eng.encode_first_stage(state, x)
    assert z.shape == (2, 16, 16, 4)
    y = eng.decode_first_stage(state, z, timesteps=2)
    assert y.shape == (2, 32, 32, 3)


def test_engine_bf16_and_remat(tiny_engine):
    import dataclasses as _dc
    eng, state, cfg = tiny_engine
    cfg2 = _dc.replace(cfg, compute_dtype="bfloat16", remat=True)
    eng2 = type(eng)(cfg2)
    t = cfg.num_frames
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32)
    cond = {
        "concat": jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32),
        "crossattn": jnp.asarray(rng.normal(size=(t, 1, 16)), jnp.float32),
        "vector": jnp.asarray(rng.normal(size=(t, 768)), jnp.float32),
        "control_hint": jnp.asarray(rng.normal(size=(t, 64, 64, 7)),
                                    jnp.float32),
    }
    out32 = eng.apply_model(state, x, jnp.ones((t,)), cond)
    out16 = eng2.apply_model(state, x, jnp.ones((t,)), cond)
    assert out16.dtype == jnp.float32  # f32 output contract
    # bf16 tracks f32 loosely at init-scale activations
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.15)
    # gradient flows through the remat boundary
    import dataclasses

    def f(cn):
        st = dataclasses.replace(state, controlnet=cn)
        return jnp.sum(eng2.apply_model(st, x, jnp.ones((t,)), cond) ** 2)

    g = jax.grad(f)(state.controlnet)
    assert all(np.all(np.isfinite(np.asarray(v)))
               for v in jax.tree_util.tree_leaves(g))


def test_engine_sample_inversion(tiny_engine):
    eng, state, cfg = tiny_engine
    t = cfg.num_frames
    rng = np.random.default_rng(8)
    z = jnp.asarray(rng.normal(size=(t, 8, 8, 4)), jnp.float32)
    mask = jnp.ones_like(z).at[:, :4].set(0.0)
    cond = {
        "concat": jnp.zeros((t, 8, 8, 4)),
        "crossattn": jnp.zeros((t, 1, 16)),
        "vector": jnp.zeros((t, 768)),
        "control_hint": jnp.zeros((t, 64, 64, 7)),
    }
    out = eng.sample_inversion(state, jax.random.key(5), cond, cond, z,
                               mask, num_steps=2)
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_sampling_pipeline_api():
    from multiview_inpaint_tpu.diffusion.api import (Discretization,
                                                     Guider, Sampler,
                                                     SamplingParams,
                                                     SamplingPipeline)
    target = jnp.asarray(np.random.default_rng(9).normal(size=(2, 8, 8, 4)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    for sampler in (Sampler.EULER_EDM, Sampler.HEUN_EDM,
                    Sampler.EULER_ANCESTRAL, Sampler.DPMPP2M):
        p = SamplingParams(sampler=sampler, steps=8, sigma_max=80.0,
                           guider=Guider.IDENTITY)
        pipe = SamplingPipeline(denoise_fn, p)
        out = pipe.sample(jax.random.key(0), target.shape, {}, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                   atol=0.25, err_msg=str(sampler))

    # blended needs z/mask
    p = SamplingParams(sampler=Sampler.EULER_EDM_BLENDED, steps=8,
                       sigma_max=80.0, guider=Guider.IDENTITY)
    pipe = SamplingPipeline(denoise_fn, p)
    z = jnp.zeros_like(target)
    mask = jnp.ones_like(target)
    out = pipe.sample(jax.random.key(1), target.shape, {}, None, z=z,
                      mask=mask)
    assert np.all(np.isfinite(np.asarray(out)))

    # legacy DDPM discretization builds a valid ladder
    from multiview_inpaint_tpu.diffusion.api import build_sigmas
    s = np.asarray(build_sigmas(SamplingParams(
        discretization=Discretization.LEGACY_DDPM, steps=10)))
    assert s[-1] == 0 and np.all(np.diff(s[:-1]) < 0)


def test_dpmpp2s_ancestral_converges():
    """Perfect denoiser => ~target; eta=0 makes it deterministic, and
    the midpoint second-order step must beat euler-ancestral at equal
    steps on the analytic gaussian ODE."""
    target = jnp.asarray(np.random.default_rng(8).normal(size=(1, 4, 4, 2)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(8), target.shape)
    out = samplers.dpmpp2s_ancestral_sample(denoise_fn, x0, {}, None,
                                            _sigmas(), eta=1.0,
                                            key=jax.random.key(9))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=0.05)

    rng = np.random.default_rng(9)
    mu = jnp.asarray(rng.normal(size=(1, 6, 6, 3)), jnp.float32)
    s2, smax = 0.7 ** 2, 20.0

    def gauss_denoise(x, sig, c):
        sg = sig.reshape(-1, 1, 1, 1) ** 2
        return (s2 * x + sg * mu) / (s2 + sg)

    sig = jnp.concatenate([edm.edm_sigmas(20, 0.002, smax),
                           jnp.zeros((1,))])
    x_start = jax.random.normal(jax.random.key(2), mu.shape)
    exact = mu + np.sqrt(s2 / (s2 + smax ** 2)) * (
        x_start * np.sqrt(1.0 + smax ** 2) - mu)
    e_eul = float(jnp.abs(samplers.euler_ancestral_sample(
        gauss_denoise, x_start, {}, None, sig, eta=0.0) - exact).max())
    e_2s = float(jnp.abs(samplers.dpmpp2s_ancestral_sample(
        gauss_denoise, x_start, {}, None, sig, eta=0.0) - exact).max())
    assert e_2s < 0.3 * e_eul, (e_2s, e_eul)


def test_lms_coeffs_match_reference_quad():
    """Exact polynomial integration == the reference's scipy quad
    (sampling_utils.linear_multistep_coeff, epsrel 1e-4)."""
    from scipy import integrate

    from multiview_inpaint_tpu.diffusion.samplers import _lms_coeff_matrix

    sig = np.asarray(_sigmas(10))
    order = 4
    got = _lms_coeff_matrix(sig, order)

    def ref_coeff(order_, t, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(order_):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod
        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    for i in range(len(sig) - 1):
        cur = min(i + 1, order)
        for j in range(cur):
            want = ref_coeff(cur, sig, i, j)
            assert got[i, j] == pytest.approx(want, rel=1e-4, abs=1e-9)
        assert np.all(got[i, cur:] == 0)


def test_lms_converges_and_beats_euler():
    target = jnp.asarray(np.random.default_rng(10).normal(size=(1, 4, 4, 2)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    x0 = jax.random.normal(jax.random.key(10), target.shape)
    out = samplers.lms_sample(denoise_fn, x0, {}, None, _sigmas())
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               atol=0.05)

    rng = np.random.default_rng(11)
    mu = jnp.asarray(rng.normal(size=(1, 6, 6, 3)), jnp.float32)
    s2, smax = 0.7 ** 2, 20.0

    def gauss_denoise(x, sig, c):
        sg = sig.reshape(-1, 1, 1, 1) ** 2
        return (s2 * x + sg * mu) / (s2 + sg)

    sig = jnp.concatenate([edm.edm_sigmas(20, 0.002, smax),
                           jnp.zeros((1,))])
    x_start = jax.random.normal(jax.random.key(2), mu.shape)
    exact = mu + np.sqrt(s2 / (s2 + smax ** 2)) * (
        x_start * np.sqrt(1.0 + smax ** 2) - mu)
    e_eul = float(jnp.abs(samplers.euler_edm_sample(
        gauss_denoise, x_start, {}, None, sig) - exact).max())
    e_lms = float(jnp.abs(samplers.lms_sample(
        gauss_denoise, x_start, {}, None, sig) - exact).max())
    assert e_lms < 0.3 * e_eul, (e_lms, e_eul)


def test_sampling_api_new_samplers():
    """The inference API dispatches the two new enum entries."""
    from multiview_inpaint_tpu.diffusion.api import (Guider, Sampler,
                                                     SamplingParams,
                                                     SamplingPipeline)

    target = jnp.asarray(np.random.default_rng(12).normal(size=(1, 4, 4, 2)),
                         jnp.float32)

    def denoise_fn(x, s, c):
        return jnp.broadcast_to(target, x.shape)

    for name in (Sampler.DPMPP2S_ANCESTRAL, Sampler.LINEAR_MULTISTEP):
        pipe = SamplingPipeline(
            denoise_fn, SamplingParams(sampler=name, steps=12,
                                       sigma_max=80.0,
                                       guider=Guider.IDENTITY))
        out = pipe.sample(jax.random.key(0), target.shape, {})
        np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                   atol=0.08, err_msg=str(name))
