"""Diffusion samplers as jitted ``lax.scan`` loops.

Parity with ``sgm/modules/diffusionmodules/sampling.py`` at the
capabilities the pipeline uses:

- :func:`euler_edm_sample` — EulerEDMSampler (gamma-churn Euler over the
  Karras sigma schedule; the paper's 25-step inference sampler),
- :func:`euler_edm_sample_blended` — EulerEDMSampler2 (per-step latent
  blending ``x = x*mask + (z + noise*sigma)*(1-mask)``),
- :func:`euler_edm_sample_inversion` — EulerEDMSampler3 (a DDIM-style
  inversion pass with the exact (sigma^2+1) rescaling, then blended
  resampling against the inverted latents),
- :func:`heun_edm_sample` — EDM Heun correction step,
- :func:`euler_ancestral_sample` and :func:`dpmpp2m_sample` — the stock
  ancestral / multistep alternatives.

``denoise_fn(x, sigma_vec, cond) -> denoised`` closes over network params;
each sampler composes it with a guider's prepare/combine. The whole loop
is one XLA program: no host round trips between steps.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .guiders import IdentityGuider

# ---------------------------------------------------------------------
# Opt-in latent debugging (the reference's EDMSampler3 sprinkles
# np.save(x) calls through its loop, sampling.py:271-354; here the loops
# are jitted lax.scans, so dumps ride jax.debug.callback). Register a
# hook BEFORE the sampler is first traced — already-compiled programs
# contain no callback op (jax.clear_caches() forces a retrace).
_debug_hook: Optional[Callable] = None


def set_latent_debug_hook(hook: Optional[Callable]):
    """hook(tag: str, sigma, x) is called once per sampler step with the
    post-update latent (host numpy arrays). Returns the previous hook."""
    global _debug_hook
    prev, _debug_hook = _debug_hook, hook
    return prev


def _emit(tag: str, sigma, x):
    if _debug_hook is not None:
        jax.debug.callback(_debug_hook, tag, sigma, x, ordered=True)


class LatentDumper:
    """Writes ``{prefix}_{i:03d}_{tag}.npy`` per sampler step plus a
    ``{prefix}_sigmas.npy`` ladder on close."""

    def __init__(self, out_dir: str, prefix: str = "latent"):
        import numpy as np
        self._np = np
        self.out_dir = out_dir
        self.prefix = prefix
        self.i = 0
        self.sigmas = []
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, tag, sigma, x):
        self._np.save(os.path.join(
            self.out_dir, f"{self.prefix}_{self.i:03d}_{tag}.npy"),
            self._np.asarray(x))
        self.sigmas.append(float(sigma))
        self.i += 1

    def close(self):
        self._np.save(os.path.join(self.out_dir,
                                   f"{self.prefix}_sigmas.npy"),
                      self._np.asarray(self.sigmas))


@contextlib.contextmanager
def latent_dump(out_dir: str, prefix: str = "latent"):
    """Context manager: dump every sampler step's latent to ``out_dir``.
    Clears jit caches on entry so already-traced samplers re-trace with
    the callback baked in."""
    dumper = LatentDumper(out_dir, prefix)
    jax.clear_caches()
    prev = set_latent_debug_hook(dumper)
    try:
        yield dumper
    finally:
        set_latent_debug_hook(prev)
        dumper.close()
        jax.clear_caches()


def _bdims(s, x):
    return s.reshape(s.shape + (1,) * (x.ndim - 1))


def _to_d(x, sigma, denoised):
    return (x - denoised) / _bdims(sigma, x)


def _guided_denoise(denoise_fn, guider, x, sigma_vec, cond, uc):
    gx, gs, gc = guider.prepare(x, sigma_vec, cond, uc)
    return guider.combine(denoise_fn(gx, gs, gc), sigma_vec)


def prepare_x(x, sigmas):
    """The reference's prepare_sampling_loop scaling: x *= sqrt(1+s0^2)."""
    return x * jnp.sqrt(1.0 + sigmas[0] ** 2)


def _gammas(sigmas, s_churn, s_tmin, s_tmax):
    n = sigmas.shape[0] - 1
    g = jnp.minimum(s_churn / jnp.maximum(n - 1, 1), 2 ** 0.5 - 1)
    inside = (sigmas[:-1] >= s_tmin) & (sigmas[:-1] <= s_tmax)
    return jnp.where(inside, g, 0.0)


def euler_edm_sample(denoise_fn: Callable, x: jnp.ndarray, cond: Dict,
                     uc: Optional[Dict], sigmas: jnp.ndarray,
                     guider=IdentityGuider(), key: Optional[jax.Array] = None,
                     s_churn: float = 0.0, s_tmin: float = 0.0,
                     s_tmax: float = float("inf"),
                     s_noise: float = 1.0) -> jnp.ndarray:
    """sigmas: [n+1] descending ending in 0 (append 0 to edm_sigmas)."""
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    gammas = _gammas(sigmas, s_churn, s_tmin, s_tmax)
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma, gamma = inp
        k, sub = jax.random.split(k)
        sigma_hat = sigma * (gamma + 1.0)
        eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(
                          sigma_hat ** 2 - sigma ** 2, 0.0)), x)
        s_vec = jnp.full((b,), sigma_hat, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        x = x + (next_sigma - sigma_hat) * d
        _emit("euler", sigma_hat, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(
        step, (x, key), (sigmas[:-1], sigmas[1:], gammas))
    return x


def heun_edm_sample(denoise_fn, x, cond, uc, sigmas,
                    guider=IdentityGuider(), key=None, s_churn=0.0,
                    s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    gammas = _gammas(sigmas, s_churn, s_tmin, s_tmax)
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma, gamma = inp
        k, sub = jax.random.split(k)
        sigma_hat = sigma * (gamma + 1.0)
        eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(
                          sigma_hat ** 2 - sigma ** 2, 0.0)), x)
        s_vec = jnp.full((b,), sigma_hat, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        dt = next_sigma - sigma_hat
        x_e = x + dt * d
        # Heun correction, skipped on the final (sigma -> 0) step.
        ns_vec = jnp.full((b,), jnp.maximum(next_sigma, 1e-9), x.dtype)
        den2 = _guided_denoise(denoise_fn, guider, x_e, ns_vec, cond, uc)
        d2 = _to_d(x_e, ns_vec, den2)
        x_h = x + dt * 0.5 * (d + d2)
        x = jnp.where(next_sigma > 0, x_h, x_e)
        _emit("heun", sigma_hat, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(
        step, (x, key), (sigmas[:-1], sigmas[1:], gammas))
    return x


def euler_edm_sample_blended(denoise_fn, x, cond, uc, sigmas, z, mask,
                             guider=IdentityGuider(), key=None,
                             s_churn=0.0, s_tmin=0.0,
                             s_tmax=float("inf"), s_noise=1.0):
    """EulerEDMSampler2: renoise the background latents each step and blend
    through the mask (mask==1 keeps the sampled region)."""
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    gammas = _gammas(sigmas, s_churn, s_tmin, s_tmax)
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma, gamma = inp
        k, k1, k2 = jax.random.split(k, 3)
        sigma_hat = sigma * (gamma + 1.0)
        eps = jax.random.normal(k1, x.shape, x.dtype) * s_noise
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(
                          sigma_hat ** 2 - sigma ** 2, 0.0)), x)
        noise = jax.random.normal(k2, z.shape, z.dtype)
        noised_z = z + noise * sigma_hat
        x = x * mask + noised_z * (1.0 - mask)
        s_vec = jnp.full((b,), sigma_hat, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        x = x + (next_sigma - sigma_hat) * d
        _emit("blended", sigma_hat, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(
        step, (x, key), (sigmas[:-1], sigmas[1:], gammas))
    return x


def euler_edm_sample_inversion(denoise_fn, inv_denoise_fn, x, cond, uc,
                               sigmas, z, mask,
                               guider=IdentityGuider(),
                               inv_guider=IdentityGuider(), key=None,
                               s_churn=0.0, s_tmin=0.0,
                               s_tmax=float("inf"), s_noise=1.0):
    """EulerEDMSampler3: DDIM-style inversion of the background latents up
    the sigma ladder, then blended resampling against the per-step
    inverted latents.

    ``inv_denoise_fn`` receives raw net output semantics (the reference's
    ``Denoiser.inv_sample``); the inversion recurrence uses the exact
    (sigma^2+1) rescaling (``sampling.py:248-258``).
    """
    uc = cond if uc is None else uc
    b = x.shape[0]

    # --- inversion: sigmas[-i-1] -> sigmas[-i-2] over i = 0..n-1
    def inv_step(x_inv, inp):
        sigma, next_sigma = inp
        s_vec = jnp.full((b,), next_sigma, x.dtype)
        gx, gs, gc = inv_guider.prepare(x_inv, s_vec, cond, uc)
        denoised = inv_guider.combine(inv_denoise_fn(gx, gs, gc), s_vec)
        x_scale = (next_sigma ** 2 + 1) / (sigma * next_sigma + 1)
        y_scale = ((next_sigma - sigma) * jnp.sqrt(next_sigma ** 2 + 1)
                   / (sigma * next_sigma + 1))
        x_inv = x_scale * x_inv + y_scale * denoised
        _emit("invert", next_sigma, x_inv)
        return x_inv, x_inv

    inv_pairs = (jnp.flip(sigmas)[:-1], jnp.flip(sigmas)[1:])
    _, inversion_z = jax.lax.scan(inv_step, z, inv_pairs)
    inversion_z = jnp.flip(inversion_z, axis=0)  # step i uses ladder top

    # --- blended resampling
    x = prepare_x(x, sigmas)
    gammas = _gammas(sigmas, s_churn, s_tmin, s_tmax)
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma, gamma, z_i = inp
        k, sub = jax.random.split(k)
        sigma_hat = sigma * (gamma + 1.0)
        eps = jax.random.normal(sub, x.shape, x.dtype) * s_noise
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(
                          sigma_hat ** 2 - sigma ** 2, 0.0)), x)
        x = x * mask + z_i * (1.0 - mask)
        s_vec = jnp.full((b,), sigma_hat, x.dtype)
        gx, gs, gc = inv_guider.prepare(x, s_vec, cond, uc)
        denoised = inv_guider.combine(denoise_fn(gx, gs, gc), s_vec)
        d = _to_d(x, s_vec, denoised)
        x = x + (next_sigma - sigma_hat) * d
        _emit("inversion", sigma_hat, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(
        step, (x, key), (sigmas[:-1], sigmas[1:], gammas, inversion_z))
    return x


def euler_ancestral_sample(denoise_fn, x, cond, uc, sigmas,
                           guider=IdentityGuider(), key=None, eta=1.0,
                           s_noise=1.0):
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma = inp
        k, sub = jax.random.split(k)
        sigma_up = jnp.minimum(
            next_sigma,
            eta * (next_sigma ** 2 * (sigma ** 2 - next_sigma ** 2)
                   / jnp.maximum(sigma ** 2, 1e-12)) ** 0.5)
        sigma_down = jnp.sqrt(jnp.maximum(
            next_sigma ** 2 - sigma_up ** 2, 0.0))
        s_vec = jnp.full((b,), sigma, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        x = x + (sigma_down - sigma) * d
        noise = jax.random.normal(sub, x.shape, x.dtype) * s_noise
        x = jnp.where(next_sigma > 0, x + noise * sigma_up, x)
        _emit("ancestral", sigma, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def dpmpp2m_sample(denoise_fn, x, cond, uc, sigmas,
                   guider=IdentityGuider()):
    """DPM-Solver++(2M) — deterministic multistep."""
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def step(carry, inp):
        x, old_denoised, prev_sigma = carry
        sigma, next_sigma = inp
        s_vec = jnp.full((b,), sigma, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        t, t_next = t_of(sigma), t_of(next_sigma)
        h = t_next - t
        x_std = (next_sigma / sigma) * x - jnp.expm1(-h) * denoised
        h_last = t - t_of(prev_sigma)
        r = h_last / jnp.where(h == 0, 1.0, h)
        denoised_d = ((1 + 1 / (2 * r)) * denoised
                      - (1 / (2 * r)) * old_denoised)
        x_adv = (next_sigma / sigma) * x - jnp.expm1(-h) * denoised_d
        use_multi = (prev_sigma > 0) & (next_sigma > 0)
        x = jnp.where(next_sigma == 0, x_std,
                      jnp.where(use_multi, x_adv, x_std))
        _emit("dpmpp2m", sigma, x)
        return (x, denoised, sigma), None

    init = (x, jnp.zeros_like(x), jnp.zeros((), x.dtype))
    (x, _, _), _ = jax.lax.scan(step, init, (sigmas[:-1], sigmas[1:]))
    return x


def unipc_sample(denoise_fn, x, cond, uc, sigmas,
                 guider=IdentityGuider()):
    """UniPC, order 2, the bh2 variant with x0-prediction — the
    diffusers ``UniPCMultistepScheduler`` defaults the reference swaps
    into the SD ControlNet inpaint pipeline
    (``gs-simp/ctrl_inpaint.py:12``), re-derived in Karras sigma space
    (alpha == 1, lambda = -log sigma).

    Per step: the fresh model eval at the predicted point first
    *corrects* the previous update (uni_c, order ramping 1 -> 2), then
    the predictor advances (uni_p; at order 2/bh2 the predictor
    coincides algebraically with DPM-Solver++(2M)). The corrector is
    what distinguishes UniPC: each model eval is used twice.
    """
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]

    def t_of(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    def nz(v):
        return jnp.where(v == 0, 1.0, v)

    def step(carry, inp):
        x, last_x, m1, m2, s1, s2 = carry
        i, sigma, next_sigma = inp
        s_vec = jnp.full((b,), sigma, x.dtype)
        m0 = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)

        # ---- uni_c: correct the previous predictor update using m0,
        # the model eval AT the predicted point (i >= 1). ----
        hc = t_of(sigma) - t_of(s1)
        bhc = jnp.expm1(-hc)          # B_h = h_phi_1 for bh2
        x_c_ = (sigma / nz(s1)) * last_x - bhc * m1
        d1_t = m0 - m1                 # rks[-1] == 1
        # order-2 coefficients (needs m2, i >= 2)
        r0 = (t_of(s2) - t_of(s1)) / nz(hc)
        d1s0 = (m2 - m1) / nz(r0)
        hphi_k1 = bhc / nz(-hc) - 1.0
        b1 = hphi_k1 / nz(bhc)
        hphi_k2 = hphi_k1 / nz(-hc) - 0.5
        b2 = 2.0 * hphi_k2 / nz(bhc)
        rho1 = (b1 - b2) / nz(1.0 - r0)
        rho2 = (b2 - r0 * b1) / nz(1.0 - r0)
        corr2 = x_c_ - bhc * (rho1 * d1s0 + rho2 * d1_t)
        corr1 = x_c_ - bhc * 0.5 * d1_t
        x = jnp.where(i >= 2, corr2, jnp.where(i >= 1, corr1, x))

        # ---- uni_p: advance from the corrected sample with m0 (and
        # m1 at order 2; identical to DPM++(2M) at bh2). ----
        h = t_of(next_sigma) - t_of(sigma)
        bh = jnp.expm1(-h)
        x_std = (next_sigma / nz(sigma)) * x - bh * m0
        rp = (t_of(s1) - t_of(sigma)) / nz(h)
        d1p = (m1 - m0) / nz(rp)
        x_p2 = x_std - bh * 0.5 * d1p
        x_next = jnp.where((next_sigma == 0) | (i < 1), x_std, x_p2)
        _emit("unipc", sigma, x_next)
        return (x_next, x, m0, m1, sigma, s1), None

    n = sigmas.shape[0] - 1
    init = (x, x, jnp.zeros_like(x), jnp.zeros_like(x),
            jnp.ones((), x.dtype), jnp.ones((), x.dtype))
    (x, *_), _ = jax.lax.scan(
        step, init, (jnp.arange(n), sigmas[:-1], sigmas[1:]))
    return x


def dpmpp2s_ancestral_sample(denoise_fn, x, cond, uc, sigmas,
                             guider=IdentityGuider(), key=None, eta=1.0,
                             s_noise=1.0):
    """DPM-Solver++(2S) ancestral — reference DPMPP2SAncestralSampler
    (``sgm/modules/diffusionmodules/sampling.py:487-524``): per step an
    ancestral (sigma_down, sigma_up) split, a midpoint second-order
    solve in t = -log(sigma) space (two denoiser calls), and noise
    re-injection. The reference skips the second call when sigma_down
    == 0 (its final step); under ``lax.scan`` both branches compute and
    a ``where`` selects the euler fallback — identical results, one
    traced program."""
    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    key = jax.random.key(0) if key is None else key

    def step(carry, inp):
        x, k = carry
        sigma, next_sigma = inp
        k, sub = jax.random.split(k)
        sigma_up = jnp.minimum(
            next_sigma,
            eta * (next_sigma ** 2 * (sigma ** 2 - next_sigma ** 2)
                   / jnp.maximum(sigma ** 2, 1e-12)) ** 0.5)
        sigma_down = jnp.sqrt(jnp.maximum(
            next_sigma ** 2 - sigma_up ** 2, 0.0))
        s_vec = jnp.full((b,), sigma, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        x_euler = x + (sigma_down - sigma) * d

        # Midpoint rule in t = -log(sigma): t_mid = t + h/2, so
        # sigma(t_mid)/sigma(t) = exp(-h/2) etc. (get_mult,
        # sampling.py:494-500). sigma_down==0 -> h=inf; the clamp keeps
        # the dead branch finite (its result is discarded by the where).
        sd = jnp.maximum(sigma_down, 1e-10)
        h = jnp.log(sigma) - jnp.log(sd)          # t_down - t, positive
        sigma_mid = jnp.exp(-(-jnp.log(sigma) + 0.5 * h))
        x2 = jnp.exp(-0.5 * h) * x - jnp.expm1(-0.5 * h) * denoised
        s2_vec = jnp.full((b,), sigma_mid, x.dtype)
        denoised2 = _guided_denoise(denoise_fn, guider, x2, s2_vec,
                                    cond, uc)
        x_2s = jnp.exp(-h) * x - jnp.expm1(-h) * denoised2

        x = jnp.where(sigma_down > 0, x_2s, x_euler)
        noise = jax.random.normal(sub, x.shape, x.dtype) * s_noise
        x = jnp.where(next_sigma > 0, x + noise * sigma_up, x)
        _emit("dpmpp2s", sigma, x)
        return (x, k), None

    (x, _), _ = jax.lax.scan(step, (x, key), (sigmas[:-1], sigmas[1:]))
    return x


def _lms_coeff_matrix(sigmas: "np.ndarray", order: int) -> "np.ndarray":
    """[num_steps, order] Adams-Bashforth coefficients over the sigma
    grid — reference ``sampling_utils.linear_multistep_coeff`` computes
    each ∫ of the Lagrange basis polynomial with scipy quad (epsrel
    1e-4); the integrand is a degree<(order) polynomial, so this
    integrates it EXACTLY via numpy polynomials instead. Column j pairs
    with d_{i-j}; columns beyond min(i+1, order) are zero (warm-up)."""
    import numpy as np
    from numpy.polynomial import polynomial as npoly

    t = np.asarray(sigmas, np.float64)
    n = len(t) - 1
    out = np.zeros((n, order), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            roots = [t[i - k] for k in range(cur) if k != j]
            denom = np.prod([t[i - j] - t[i - k]
                             for k in range(cur) if k != j]) or 1.0
            poly = npoly.polyfromroots(roots) / denom
            anti = npoly.polyint(poly)
            out[i, j] = (npoly.polyval(t[i + 1], anti)
                         - npoly.polyval(t[i], anti))
    return out


def lms_sample(denoise_fn, x, cond, uc, sigmas,
               guider=IdentityGuider(), order: int = 4):
    """Linear multistep (Adams-Bashforth over the sigma grid) —
    reference LinearMultistepSampler (``sampling.py:399-433``). The
    coefficient table depends only on the (concrete) sigma schedule and
    is precomputed exactly on the host; the scan carries the last
    ``order`` derivative estimates in a fixed ring buffer (slot j =
    d_{i-j}), so one jitted program serves the whole trajectory."""
    import numpy as np

    uc = cond if uc is None else uc
    x = prepare_x(x, sigmas)
    b = x.shape[0]
    coeffs = jnp.asarray(_lms_coeff_matrix(np.asarray(sigmas), order),
                         x.dtype)

    def step(carry, inp):
        x, ds = carry                   # ds: [order, *x.shape]
        sigma, c = inp
        s_vec = jnp.full((b,), sigma, x.dtype)
        denoised = _guided_denoise(denoise_fn, guider, x, s_vec, cond, uc)
        d = _to_d(x, s_vec, denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        x = x + jnp.tensordot(c, ds, axes=1)
        _emit("lms", sigma, x)
        return (x, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(step, (x, ds0), (sigmas[:-1], coeffs))
    return x
