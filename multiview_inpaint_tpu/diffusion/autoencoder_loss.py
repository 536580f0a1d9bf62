"""Autoencoder (VAE) adversarial training losses — GAN discriminator,
hinge/vanilla losses, and the LPIPS+NLL+KL generator objective.

TPU-native rebuild of the reference's autoencoding loss stack
(``svd_inpaint1/sgm/modules/autoencoding/losses/discriminator_loss.py``
GeneralLPIPSWithDiscriminator, ``.../lpips/model/model.py``
NLayerDiscriminator, ``.../lpips/vqperceptual.py`` hinge/vanilla
d-losses). The reference trains its first-stage AutoencoderKL with a
PatchGAN discriminator (pix2pix), a perceptual (LPIPS) + L1 NLL
reconstruction term with a learnable log-variance, KL regularization,
and an adaptive generator/discriminator balance. This module provides
the same objective as pure functions over flax modules:

- :class:`PatchDiscriminator` — NLayerDiscriminator equivalent (k4/s2
  conv ladder, LeakyReLU 0.2, 1-channel patch logits). Norm choices:
  ``"group"`` (default — batch-size independent, SPMD-friendly: no
  cross-device batch-stat sync on a dp mesh), ``"batch"`` (the
  reference's default; torch-golden-tested in eval mode) or ``None``
  (the reference's ActNorm-free variant).
- :func:`hinge_d_loss` / :func:`vanilla_d_loss` — exact formulas.
- :func:`generator_loss` / :func:`discriminator_loss` — the
  ``optimizer_idx == 0 / 1`` halves of the reference's forward, as two
  separate pure functions (JAX has no shared-module double-optimizer
  step; the train loop alternates them, see
  ``pipelines/vae_finetune.py``).

Adaptive weight: the reference balances ``d_weight =
||∂nll/∂last_layer|| / ||∂g/∂last_layer||`` (discriminator_loss.py:
calculate_adaptive_weight). Differentiating w.r.t. one named parameter
mid-loss is a torch idiom; here the same balance is computed in
RECONSTRUCTION space (gradients w.r.t. the decoder output — one
``jax.grad`` each, cheap, and the ratio measures the identical
signal-scale mismatch one chain-rule factor earlier). Train steps that
want the exact layer-space ratio can compute both grad norms themselves
and pass them to :func:`adaptive_weight`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchDiscriminator(nn.Module):
    """PatchGAN discriminator (pix2pix NLayerDiscriminator):
    ``model.py:17-88``. NHWC in, [B, H/8, W/8, 1] patch logits out
    (n_layers=3)."""
    ndf: int = 64
    n_layers: int = 3
    norm: Optional[str] = "group"   # "group" | "batch" | None

    def _norm(self, x, name, train):
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train,
                                name=name)(x)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=32, name=name)(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(kernel_size=(4, 4), padding=[(1, 1), (1, 1)])
        x = nn.Conv(self.ndf, strides=(2, 2), name="conv_0", **kw)(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for i in range(1, self.n_layers):
            nf = min(2 ** i, 8)
            # BatchNorm's affine params make the conv bias redundant
            # (use_bias logic in model.py:36-40).
            x = nn.Conv(self.ndf * nf, strides=(2, 2),
                        use_bias=(self.norm != "batch"),
                        name=f"conv_{i}", **kw)(x)
            x = self._norm(x, f"norm_{i}", train)
            x = nn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, strides=(1, 1),
                    use_bias=(self.norm != "batch"),
                    name=f"conv_{self.n_layers}", **kw)(x)
        x = self._norm(x, f"norm_{self.n_layers}", train)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, strides=(1, 1), name="head", **kw)(x)


def hinge_d_loss(logits_real: jnp.ndarray,
                 logits_fake: jnp.ndarray) -> jnp.ndarray:
    """vqperceptual.py:5-9."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jnp.ndarray,
                   logits_fake: jnp.ndarray) -> jnp.ndarray:
    """vqperceptual.py:12-17."""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


@dataclasses.dataclass(frozen=True)
class GANLossConfig:
    """GeneralLPIPSWithDiscriminator's knobs
    (discriminator_loss.py:18-33)."""
    disc_start: int = 0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"        # "hinge" | "vanilla"
    learn_logvar: bool = False
    # regularizer-term weights, e.g. {"kl_loss": 1e-6}
    regularization_weights: Tuple[Tuple[str, float], ...] = ()


def adaptive_weight(nll_grad_norm, g_grad_norm, disc_weight: float):
    """discriminator_loss.py:196-205 — clamp(||∇nll||/||∇g||, 0, 1e4)
    * disc_weight, stop-gradiented."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4)) * disc_weight


def nll_loss_terms(rec_loss: jnp.ndarray, logvar: jnp.ndarray,
                   weights=None):
    """discriminator_loss.py:289-300 — heteroscedastic NLL with a
    (possibly learned) scalar log-variance; sum / batch."""
    b = rec_loss.shape[0]
    nll = rec_loss / jnp.exp(logvar) + logvar
    weighted = nll if weights is None else weights * nll
    return jnp.sum(nll) / b, jnp.sum(weighted) / b


def _fold_time(x):
    # dims==3 handling (b c t h w -> (b t) ...): our NHWC video tensors
    # already ride time on the batch axis ((b t) leading, the repo-wide
    # layout), so 5-D inputs fold their time axis here.
    if x.ndim == 5:
        return x.reshape((-1,) + x.shape[2:])
    return x


def generator_loss(disc_apply: Callable, inputs: jnp.ndarray,
                   recon: jnp.ndarray, logvar: jnp.ndarray,
                   global_step, cfg: GANLossConfig,
                   lpips_fn: Optional[Callable] = None,
                   regularization_log: Optional[Dict] = None,
                   weights=None) -> Tuple[jnp.ndarray, Dict]:
    """optimizer_idx == 0 branch (discriminator_loss.py:226-276):
    L1 + perceptual NLL, adversarial term with the adaptive balance,
    plus weighted regularizer terms (e.g. the KL from
    ``vae.DiagonalGaussian``). Differentiable w.r.t. ``recon`` (and
    ``logvar`` when learned); the discriminator is a frozen critic
    here — its params update in :func:`discriminator_loss`.

    ``global_step`` may be traced: the warm-up gate (step < disc_start)
    is a ``jnp.where``, so one jitted step serves the whole schedule.
    """
    inputs, recon = _fold_time(inputs), _fold_time(recon)

    def rec_terms(r):
        rec = jnp.abs(inputs - r)
        if lpips_fn is not None and cfg.perceptual_weight > 0:
            p = lpips_fn(inputs, r)                    # [B]
            rec = rec + cfg.perceptual_weight * p.reshape(
                (-1,) + (1,) * (rec.ndim - 1))
        nll, weighted = nll_loss_terms(rec, logvar, weights)
        return weighted, (nll, rec)

    def g_term(r):
        return -jnp.mean(disc_apply(r))

    (weighted_nll, (nll, rec)), nll_g = jax.value_and_grad(
        rec_terms, has_aux=True)(recon)
    g_loss, g_g = jax.value_and_grad(g_term)(recon)

    d_weight = adaptive_weight(jnp.linalg.norm(nll_g.reshape(-1)),
                               jnp.linalg.norm(g_g.reshape(-1)),
                               cfg.disc_weight)
    gate = (jnp.asarray(global_step) >= cfg.disc_start).astype(
        jnp.float32)
    loss = weighted_nll + gate * d_weight * cfg.disc_factor * g_loss

    log = {"loss/nll": nll, "loss/rec": jnp.mean(rec),
           "loss/g": g_loss, "scalars/d_weight": d_weight,
           "scalars/logvar": logvar}
    for k, w in cfg.regularization_weights:
        term = (regularization_log or {}).get(k)
        if term is not None:
            loss = loss + w * jnp.mean(term)
            log[k] = jnp.mean(term)
    log["loss/total"] = loss
    return loss, log


def discriminator_loss(disc_apply: Callable, inputs: jnp.ndarray,
                       recon: jnp.ndarray, global_step,
                       cfg: GANLossConfig) -> Tuple[jnp.ndarray, Dict]:
    """optimizer_idx == 1 branch (discriminator_loss.py:277-287):
    real/fake patch logits -> hinge or vanilla loss, gated by the
    warm-up schedule. Differentiable w.r.t. the discriminator params
    closed over in ``disc_apply``; inputs/recon are detached by
    construction (the caller does not differentiate through them)."""
    inputs, recon = _fold_time(inputs), _fold_time(recon)
    logits_real = disc_apply(jax.lax.stop_gradient(inputs))
    logits_fake = disc_apply(jax.lax.stop_gradient(recon))
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    gate = (jnp.asarray(global_step) >= cfg.disc_start).astype(
        jnp.float32)
    d_loss = gate * cfg.disc_factor * fn(logits_real, logits_fake)
    return d_loss, {"loss/disc": d_loss,
                    "logits/real": jnp.mean(logits_real),
                    "logits/fake": jnp.mean(logits_fake)}
