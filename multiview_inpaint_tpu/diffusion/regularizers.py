"""Autoencoder latent regularizers — KL and vector quantization.

Reference: ``sgm/modules/autoencoding/regularizers/__init__.py``
(DiagonalGaussianRegularizer) and ``regularizers/quantize.py``
(VectorQuantizer :172-320, EmbeddingEMA/EMAVectorQuantizer :323-443).
The pipeline's first stage is the KL autoencoder, but the sgm framework
also ships VQ regularizers for VQ-GAN-style first stages; this module
completes that surface TPU-natively:

- :func:`diagonal_gaussian_regularizer` — sample/mode + the summed KL
  (feeds ``autoencoder_loss.generator_loss`` as ``kl_loss``).
- :class:`VectorQuantizer` — nearest-codebook lookup as ONE [M, K]
  matmul distance (‖z‖² − 2 z·e + ‖e‖² ranks like −2 z·e + ‖e‖², so
  the z-norm term is dropped), straight-through estimator, β-commitment
  loss, codebook perplexity.
- :func:`ema_codebook_update` — the EMAVectorQuantizer's
  cluster-size/embedding EMA as a PURE update over an explicit state
  pytree (no buffers mutating inside modules — the state rides the
  train-step carry like optimizer state; Laplace-smoothed normalization
  as in EmbeddingEMA :341-352).

Legacy knobs not ported (documented): the ``remap``/``used-indices``
machinery (taming-transformers checkpoint subsetting) and the Gumbel
quantizer (unused by any sgm first stage here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def diagonal_gaussian_regularizer(z_params: jnp.ndarray, key=None,
                                  sample: bool = True
                                  ) -> Tuple[jnp.ndarray, Dict]:
    """(mean ++ logvar) channels -> (z, {"kl_loss"}): regularizers/
    __init__.py:13-31 (sum KL / batch)."""
    from .vae import DiagonalGaussian

    post = DiagonalGaussian(z_params)
    z = post.sample(key) if sample else post.mode()
    kl = 0.5 * jnp.sum(post.mean ** 2 + jnp.exp(post.logvar) - 1.0
                       - post.logvar,
                       axis=tuple(range(1, post.mean.ndim)))
    return z, {"kl_loss": jnp.sum(kl) / kl.shape[0]}


def perplexity(one_hot: jnp.ndarray) -> jnp.ndarray:
    """exp(entropy) of codebook usage (base.measure_perplexity)."""
    probs = jnp.mean(one_hot, axis=0)
    return jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))


class VectorQuantizer(nn.Module):
    """quantize.py:172-320 — nearest-neighbor codebook with the
    straight-through estimator. Input [..., D]; returns (z_q, log) with
    ``log["vq_loss"]`` = codebook + β·commitment terms and
    ``log["indices"]`` the flat code ids."""
    n_codes: int = 8192
    dim: int = 4
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "codebook",
            lambda k: jax.random.uniform(
                k, (self.n_codes, self.dim),
                minval=-1.0 / self.n_codes, maxval=1.0 / self.n_codes))
        flat = z.reshape(-1, self.dim)
        idx = _nearest_code(flat, codebook)
        z_q = codebook[idx].reshape(z.shape)
        # codebook pull + commitment (quantize.py:263-265)
        loss = (jnp.mean((jax.lax.stop_gradient(z) - z_q) ** 2)
                + self.beta
                * jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2))
        # straight-through: forward z_q, backward identity to z
        z_st = z + jax.lax.stop_gradient(z_q - z)
        one_hot = jax.nn.one_hot(idx, self.n_codes)
        return z_st, {"vq_loss": loss, "indices": idx,
                      "perplexity": perplexity(one_hot)}


def _nearest_code(flat: jnp.ndarray, codebook: jnp.ndarray):
    """argmin_k ‖z − e_k‖²; the z² term is rank-irrelevant, so the
    distance is one MXU matmul + a bias."""
    scores = flat @ codebook.T - 0.5 * jnp.sum(codebook ** 2, axis=1)
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


def init_ema_codebook(key, n_codes: int, dim: int) -> Dict:
    """State pytree for :func:`ema_codebook_update` (EmbeddingEMA
    :323-339): codebook + EMA cluster sizes + EMA embedding sums."""
    w = jax.random.normal(key, (n_codes, dim))
    return {"codebook": w, "cluster_size": jnp.zeros((n_codes,)),
            "embed_avg": w.copy()}


def ema_quantize(state: Dict, z: jnp.ndarray,
                 beta: float = 0.25) -> Tuple[jnp.ndarray, Dict]:
    """Forward through the EMA codebook (EMAVectorQuantizer :395-443):
    straight-through z_q + β-commitment loss (the codebook itself
    trains via :func:`ema_codebook_update`, not this gradient)."""
    dim = state["codebook"].shape[1]
    flat = z.reshape(-1, dim)
    idx = _nearest_code(flat, state["codebook"])
    z_q = state["codebook"][idx].reshape(z.shape)
    loss = beta * jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
    z_st = z + jax.lax.stop_gradient(z_q - z)
    one_hot = jax.nn.one_hot(idx, state["codebook"].shape[0])
    return z_st, {"vq_loss": loss, "indices": idx,
                  "perplexity": perplexity(one_hot)}


def ema_codebook_update(state: Dict, z: jnp.ndarray,
                        decay: float = 0.99,
                        eps: float = 1e-5) -> Dict:
    """One EMA step over a batch of latents (EmbeddingEMA
    :341-352 cluster_size/embed_avg updates + Laplace-smoothed
    normalization). Pure: returns the new state."""
    dim = state["codebook"].shape[1]
    n_codes = state["codebook"].shape[0]
    flat = z.reshape(-1, dim)
    one_hot = jax.nn.one_hot(_nearest_code(flat, state["codebook"]),
                             n_codes)
    counts = jnp.sum(one_hot, axis=0)                 # [K]
    sums = one_hot.T @ flat                           # [K, D]
    cluster = state["cluster_size"] * decay + (1 - decay) * counts
    embed_avg = state["embed_avg"] * decay + (1 - decay) * sums
    n = jnp.sum(cluster)
    smoothed = (cluster + eps) / (n + n_codes * eps) * n
    return {"codebook": embed_avg / smoothed[:, None],
            "cluster_size": cluster, "embed_avg": embed_avg}
