"""Data-parallel GS training over a camera batch on a device mesh.

The reference farms scenes across GPUs at the shell level
(``gs-simp/train.sh``); on TPU we go further: one jitted SPMD step trains
on a *batch of views* sharded over the ``data`` mesh axis (params
replicated, per-view render/loss local to each device, gradient mean = an
XLA ``psum`` inserted automatically). This is also the multi-chip path the
driver dry-runs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gs.gaussians import GaussianParams
from ..models.gs_trainer import (_FIELDS, OptimizationConfig, TrainState,
                                 _group_lrs)
from ..ops.rasterizer import RenderCamera, render
from ..utils import losses as loss_utils


class CameraBatch(NamedTuple):
    """Array-of-structs camera batch (leading dim = views)."""
    world_view: jnp.ndarray  # [B, 4, 4]
    full_proj: jnp.ndarray   # [B, 4, 4]
    campos: jnp.ndarray      # [B, 3]
    images: jnp.ndarray      # [B, H, W, 3]

    @classmethod
    def from_cameras(cls, cams) -> "CameraBatch":
        import numpy as np
        return cls(
            world_view=jnp.asarray(np.stack([c.world_view for c in cams])),
            full_proj=jnp.asarray(np.stack([c.full_proj for c in cams])),
            campos=jnp.asarray(np.stack([c.camera_center for c in cams])),
            images=jnp.asarray(np.stack([c.image for c in cams])),
        )


@partial(jax.jit,
         static_argnames=("cfg", "spatial_lr_scale", "tan_fovx", "tan_fovy",
                          "width", "height", "sh_degree", "max_per_tile",
                          "pair_budget_mult", "backend"))
def dp_train_step(state: TrainState, batch: CameraBatch,
                  bg_color: jnp.ndarray, cfg: OptimizationConfig,
                  spatial_lr_scale: float, tan_fovx: float, tan_fovy: float,
                  width: int, height: int, sh_degree: int = 0,
                  max_per_tile: int = 512, pair_budget_mult: int = 8,
                  backend: str = "xla"):
    """One SPMD step over a view batch: mean loss over all views."""
    p = state.params
    n = p.capacity
    float_fields = {f: getattr(p, f) for f in _FIELDS}

    def per_view_loss(fields, wv, fp, cp, gt):
        params = GaussianParams(live=p.live, **fields)
        cam = RenderCamera(world_view=wv, full_proj=fp, campos=cp,
                           tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                           width=width, height=height)
        out = render(params, cam, bg_color, sh_degree=sh_degree,
                     max_per_tile=max_per_tile,
                     pair_budget=pair_budget_mult * n, backend=backend)
        pred = jnp.transpose(out.rgb, (2, 0, 1))
        gtc = jnp.transpose(gt, (2, 0, 1))
        l1 = loss_utils.l1_loss(pred, gtc)
        return ((1 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1 - loss_utils.ssim(pred, gtc)))

    def loss_fn(fields):
        losses = jax.vmap(per_view_loss, in_axes=(None, 0, 0, 0, 0))(
            fields, batch.world_view, batch.full_proj, batch.campos,
            batch.images)
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(float_fields)

    step = state.step + 1
    lrs = _group_lrs(cfg, step, spatial_lr_scale)
    b1, b2, eps = 0.9, 0.999, 1e-15
    t = step.astype(jnp.float32)
    bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
    new_fields, new_mu, new_nu = {}, {}, {}
    for f in _FIELDS:
        g = grads[f]
        rowmask = p.live.reshape((n,) + (1,) * (g.ndim - 1))
        g = jnp.where(rowmask, g, 0.0)
        m = b1 * state.mu[f] + (1 - b1) * g
        v = b2 * state.nu[f] + (1 - b2) * g * g
        upd = lrs[f] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_fields[f] = float_fields[f] - jnp.where(rowmask, upd, 0.0)
        new_mu[f], new_nu[f] = m, v

    new_state = dataclasses.replace(
        state, params=GaussianParams(live=p.live, **new_fields),
        mu=new_mu, nu=new_nu, step=step)
    return new_state, loss


def shard_for_dp(state: TrainState, batch: CameraBatch, mesh: Mesh):
    """Replicate the train state, shard the view batch over ``data``."""
    rep = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), state)
    batch = CameraBatch(*[
        jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1)))))
        for a in batch])
    return state, batch
