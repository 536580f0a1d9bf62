"""SDS coarse-geometry trainer — the reference ``sds_train.py`` loop.

One jitted step = render + background-preservation loss (L1+SSIM on the
(1-mask) region, ``sds_train.py:116-118``) + ``sds_weight`` (1e-6) times
the SDS loss from the inpainting diffusion prior on the 512x512-resized
render — all differentiated end-to-end into the gaussian fields through
the rasterizer and the VAE encoder.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gs.gaussians import GaussianParams
from ..ops.rasterizer import render
from ..utils import losses as loss_utils
from .gs_trainer import (_FIELDS, OptimizationConfig, TrainState,
                         _group_lrs)


class SDSMetrics(NamedTuple):
    loss: jnp.ndarray
    bg_loss: jnp.ndarray
    sds_loss: jnp.ndarray
    pairs: jnp.ndarray = 0


@partial(jax.jit, static_argnames=("cfg", "guidance", "spatial_lr_scale",
                                   "sh_degree", "sds_weight", "sds_size",
                                   "max_per_tile", "pair_budget_mult",
                                   "backend"))
def sds_train_step(state: TrainState, camera, gt_image, mask, bg_color,
                   cfg: OptimizationConfig, guidance, text_embs,
                   key: jax.Array, spatial_lr_scale: float = 1.0,
                   sh_degree: int = 0, sds_weight: float = 1e-6,
                   sds_size: int = 512, max_per_tile: int = 1024,
                   pair_budget_mult: float = 8, backend: str = "xla"):
    p = state.params
    n = p.capacity
    float_fields = {f: getattr(p, f) for f in _FIELDS}
    k_sds = key

    def loss_fn(fields, offset):
        params = GaussianParams(live=p.live, **fields)
        out = render(params, camera, bg_color, sh_degree=sh_degree,
                     means2d_offset=offset, max_per_tile=max_per_tile,
                     pair_budget=int(pair_budget_mult * n),
                     backend=backend)
        pred = out.rgb
        keep = (1.0 - mask)[..., None]
        pred_c = jnp.transpose(pred * keep, (2, 0, 1))
        gt_c = jnp.transpose(gt_image * keep, (2, 0, 1))
        l1 = loss_utils.l1_loss(pred_c, gt_c)
        bg = ((1 - cfg.lambda_dssim) * l1
              + cfg.lambda_dssim * (1 - loss_utils.ssim(pred_c, gt_c)))
        img512 = jax.image.resize(jnp.clip(pred, 0, 1),
                                  (sds_size, sds_size, 3), "bilinear")
        mask512 = jax.image.resize(mask, (sds_size, sds_size), "nearest")
        sds = guidance.train_step(k_sds, img512, mask512, text_embs)
        total = bg + sds_weight * sds
        return total, (bg, sds, out.radii, out.visibility,
                       out.pairs)

    offset = jnp.zeros((n, 2), jnp.float32)
    ((loss, (bg_l, sds_l, radii, vis, pairs)),
     (g_fields, g_offset)) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(float_fields, offset)

    step = state.step + 1
    lrs = _group_lrs(cfg, step, spatial_lr_scale)
    b1, b2, eps = 0.9, 0.999, 1e-15
    t = step.astype(jnp.float32)
    bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
    new_fields, new_mu, new_nu = {}, {}, {}
    for f in _FIELDS:
        g = g_fields[f]
        rowmask = p.live.reshape((n,) + (1,) * (g.ndim - 1))
        g = jnp.where(rowmask, g, 0.0)
        m = b1 * state.mu[f] + (1 - b1) * g
        v = b2 * state.nu[f] + (1 - b2) * g * g
        upd = lrs[f] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_fields[f] = float_fields[f] - jnp.where(rowmask, upd, 0.0)
        new_mu[f], new_nu[f] = m, v

    new_state = TrainState(
        params=GaussianParams(live=p.live, **new_fields),
        mu=new_mu, nu=new_nu,
        stats=state.stats.update(g_offset, radii, vis), step=step)
    return new_state, SDSMetrics(loss=loss, bg_loss=bg_l,
                             sds_loss=sds_l, pairs=pairs)
