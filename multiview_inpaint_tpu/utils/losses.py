"""Photometric losses: L1/L2, windowed SSIM, PSNR — JAX-native.

Same math as the reference (``gs-simp/utils/loss_utils.py:17-64``,
``utils/image_utils.py:14-17``): 11x11 gaussian window with sigma=1.5,
per-channel depthwise convolution, C1=0.01^2 / C2=0.03^2 stabilizers.

TPU notes: the depthwise window conv is expressed as two separable 1-D
convolutions via ``lax.conv_general_dilated`` with feature_group_count=C so
XLA lowers it to cheap fused VPU work rather than a grouped MXU conv.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2, axis=(-3, -2, -1), keepdims=True)


def psnr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse(x, y)))


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _sep_blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable same-pad gaussian blur of [C, H, W].

    precision=HIGHEST is load-bearing: TPU XLA convs default to bf16
    operand truncation, and SSIM subtracts blurred second moments
    (E[x^2] - mu^2). With ~4e-3 relative bf16 error against C2=9e-4,
    sigma^2 of smooth well-fit regions becomes noise, SSIM inflates
    past its mathematical bound of 1, and the training loss goes
    NEGATIVE (observed at iter ~2.6k of the 1080p cadence run: loss
    -0.049, i.e. "SSIM"=1.2+). CPU convs are f32, so the torch-oracle
    CI only ever saw the correct values — this is TPU-only.
    """
    c = img.shape[0]
    size = window.shape[0]
    x = img[None]  # [1, C, H, W]
    wr = jnp.tile(window.reshape(1, 1, size, 1), (c, 1, 1, 1))
    wc = jnp.tile(window.reshape(1, 1, 1, size), (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, wr.shape, ("NCHW", "OIHW", "NCHW"))
    pad = size // 2
    x = lax.conv_general_dilated(x, wr, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, wc, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x[0]


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM of two [C, H, W] images in [0, 1]."""
    window = _gaussian_window(window_size, 1.5)
    # ONE batched depthwise blur for all five moment maps: five separate
    # conv pairs each paid their own relayout copies around the conv
    # (profiled ~2.5 ms/step on the GS train step at 512x384).
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    blurred = _sep_blur(stacked, window)
    mu1, mu2 = blurred[0:c], blurred[c:2 * c]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blurred[2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[3 * c:4 * c] - mu2_sq
    sigma12 = blurred[4 * c:5 * c] - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def photometric_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                     lambda_dssim: float = 0.2) -> jnp.ndarray:
    """The reference GS training objective: (1-l)*L1 + l*(1-SSIM)."""
    return ((1.0 - lambda_dssim) * l1_loss(pred, gt)
            + lambda_dssim * (1.0 - ssim(pred, gt)))
