"""Gaussian-splatting trainer: jitted step, grouped Adam, densification.

Capability parity with the reference training loops (``gs-simp/train.py:31-132``,
``sds_train.py``, ``inpaint_rec.py``) as one reusable trainer:

- One **jitted train step** = render + photometric loss + grads + grouped
  Adam + densification-stat accumulation. The optimizer is hand-rolled Adam
  (eps 1e-15 like the reference) over the six parameter fields so moment
  "surgery" after densify/prune is a masked zeroing, not object rebuilding.
- Per-group LRs mirror ``OptimizationParams``/``InpaintOptimizationParams``
  (``gs-simp/arguments/__init__.py:76-116``), with the xyz group on the
  log-lerp schedule scaled by the scene's spatial extent.
- Densify/prune/opacity-reset run as separate jitted calls on the fixed
  capacity buffer (see ``gs.densify``); the host loop only checks the
  returned slot-pressure scalar to trigger capacity doubling (re-jit a
  handful of times per run instead of shape changes every 100 iters).
- Loss masking supports the three reference modes: plain (train.py),
  background-only masked (sds_train.py:116-118), and the per-camera
  inpainted/full vs masked switch (inpaint_rec.py:112-123).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..gs import densify as densify_mod
from ..gs.densify import DensifyStats
from ..gs.gaussians import GaussianParams
from ..ops.rasterizer import RenderCamera, render
from ..utils import losses as loss_utils
from ..utils.schedules import expon_lr

_FIELDS = ("xyz", "features_dc", "features_rest", "opacity", "scaling",
           "rotation")


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Mirrors the reference OptimizationParams defaults."""
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    max_screen_size: int = 20  # applied after opacity_reset_interval


# The stage-2 / SDS preset (reference InpaintOptimizationParams).
INPAINT_OPT = OptimizationConfig(
    iterations=5_000, position_lr_init=0.001, position_lr_final=0.00002,
    position_lr_delay_mult=0.02, position_lr_max_steps=300,
    feature_lr=0.01, rotation_lr=0.005, densification_interval=50,
    opacity_reset_interval=700, densify_from_iter=0,
    densify_until_iter=3_000)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: GaussianParams
    mu: dict          # Adam first moments, per field
    nu: dict          # Adam second moments, per field
    stats: DensifyStats
    step: jnp.ndarray  # scalar int32


def init_state(params: GaussianParams) -> TrainState:
    zeros = {f: jnp.zeros_like(getattr(params, f)) for f in _FIELDS}
    return TrainState(params=params,
                      mu=zeros,
                      nu={f: jnp.zeros_like(v) for f, v in zeros.items()},
                      stats=DensifyStats.zeros(params.capacity),
                      step=jnp.zeros((), jnp.int32))


def _group_lrs(cfg: OptimizationConfig, step, spatial_lr_scale: float):
    xyz_lr = expon_lr(step, cfg.position_lr_init * spatial_lr_scale,
                      cfg.position_lr_final * spatial_lr_scale,
                      cfg.position_lr_max_steps,
                      lr_delay_mult=cfg.position_lr_delay_mult,
                      lr_delay_steps=0)
    return {"xyz": xyz_lr,
            "features_dc": cfg.feature_lr,
            "features_rest": cfg.feature_lr / 20.0,
            "opacity": cfg.opacity_lr,
            "scaling": cfg.scaling_lr,
            "rotation": cfg.rotation_lr}


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_live: jnp.ndarray
    # True pair count of the rendered view; callers grow
    # pair_budget_mult (re-jit) when this nears mult * capacity.
    pairs: jnp.ndarray = 0
    # Smallest valid pair-expansion window this step (pallas backend);
    # callers running a tightened static ``expand_window`` must grow it
    # (re-jit) when this reaches the window.
    expand_needed: jnp.ndarray = 0
    # Count of non-finite parameter-gradient entries this step (they are
    # zeroed before the Adam update so one degenerate backward cannot
    # poison the moment buffers); a persistent non-zero count flags a
    # diverging run.
    nonfinite_grads: jnp.ndarray = 0


@partial(jax.jit, static_argnames=("cfg", "spatial_lr_scale", "sh_degree",
                                   "max_per_tile", "pair_budget_mult",
                                   "loss_mode", "backend",
                                   "expand_window"))
def train_step(state: TrainState, camera: RenderCamera,
               gt_image: jnp.ndarray, bg_color: jnp.ndarray,
               cfg: OptimizationConfig, spatial_lr_scale: float,
               sh_degree: int = 0, mask: Optional[jnp.ndarray] = None,
               loss_mode: str = "full", max_per_tile: int = 1024,
               pair_budget_mult: float = 8,
               backend: str = "xla",
               expand_window: int = 0) -> tuple[TrainState, StepMetrics]:
    """One optimization iteration.

    ``gt_image`` [H, W, 3]; ``mask`` [H, W] optional. ``loss_mode``:
      - "full": photometric on the whole frame;
      - "background": both pred and gt multiplied by (1 - mask)
        (SDS background preservation);
    """
    p = state.params
    n = p.capacity

    float_fields = {f: getattr(p, f) for f in _FIELDS}

    def loss_fn(fields, offset):
        params = GaussianParams(live=p.live, **fields)
        out = render(params, camera, bg_color, sh_degree=sh_degree,
                     means2d_offset=offset, max_per_tile=max_per_tile,
                     pair_budget=int(pair_budget_mult * n),
                     backend=backend,
                     expand_window=expand_window)
        pred = out.rgb
        gt = gt_image
        if loss_mode == "background":
            keep = (1.0 - mask)[..., None]
            pred = pred * keep
            gt = gt * keep
        # losses expect [C, H, W]
        pred_c = jnp.transpose(pred, (2, 0, 1))
        gt_c = jnp.transpose(gt, (2, 0, 1))
        l1 = loss_utils.l1_loss(pred_c, gt_c)
        loss = ((1.0 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1.0 - loss_utils.ssim(pred_c, gt_c)))
        return loss, (l1, out.radii, out.visibility, out.pairs,
                      out.expand_needed)

    offset = jnp.zeros((n, 2), jnp.float32)
    ((loss, (l1, radii, vis, pairs, expand_needed)),
     (g_fields, g_offset)) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(float_fields, offset)

    # Grouped Adam (eps 1e-15, torch-style bias correction).
    step = state.step + 1
    lrs = _group_lrs(cfg, step, spatial_lr_scale)
    b1, b2, eps = 0.9, 0.999, 1e-15
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    live_col = p.live
    new_fields, new_mu, new_nu = {}, {}, {}
    nonfinite = jnp.zeros((), jnp.int32)
    for f in _FIELDS:
        g = g_fields[f]
        # No updates for dead rows.
        rowmask = live_col.reshape((n,) + (1,) * (g.ndim - 1))
        g = jnp.where(rowmask, g, 0.0)
        # Zero (and count) non-finite gradient entries: a single
        # degenerate backward (near-singular conic, saturated alpha)
        # otherwise writes inf/NaN into the Adam moments, which is
        # absorbing — the row diverges and the poison spreads through
        # densification. The where() is identity on healthy steps.
        g_ok = jnp.isfinite(g)
        nonfinite = nonfinite + jnp.sum(~g_ok).astype(jnp.int32)
        g = jnp.where(g_ok, g, 0.0)
        m = b1 * state.mu[f] + (1 - b1) * g
        v = b2 * state.nu[f] + (1 - b2) * g * g
        upd = lrs[f] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_fields[f] = float_fields[f] - jnp.where(rowmask, upd, 0.0)
        new_mu[f] = m
        new_nu[f] = v

    new_params = GaussianParams(live=p.live, **new_fields)
    off_ok = jnp.isfinite(g_offset)
    nonfinite = nonfinite + jnp.sum(~off_ok).astype(jnp.int32)
    new_stats = state.stats.update(jnp.where(off_ok, g_offset, 0.0),
                                   radii, vis)
    new_state = TrainState(params=new_params, mu=new_mu, nu=new_nu,
                           stats=new_stats, step=step)
    return new_state, StepMetrics(loss=loss, l1=l1,
                                  num_live=jnp.sum(p.live), pairs=pairs,
                                  expand_needed=expand_needed,
                                  nonfinite_grads=nonfinite)


def zero_moments(state: TrainState, row_mask: jnp.ndarray,
                 fields=_FIELDS) -> TrainState:
    """Masked Adam-moment reset (the reference's optimizer surgery)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    for f in fields:
        m = row_mask.reshape((-1,) + (1,) * (mu[f].ndim - 1))
        mu[f] = jnp.where(m, 0.0, mu[f])
        nu[f] = jnp.where(m, 0.0, nu[f])
    return dataclasses.replace(state, mu=mu, nu=nu)


def maybe_densify(state: TrainState, key: jax.Array,
                  cfg: OptimizationConfig, extent: float,
                  iteration: int) -> tuple[TrainState, dict]:
    """Host-called densification orchestration for one iteration.

    Mirrors the schedule in ``train.py:112-124``: densify+prune every
    ``densification_interval`` in [from, until); screen-size pruning only
    after the first opacity reset; opacity reset every
    ``opacity_reset_interval``.
    """
    info = {}
    if iteration < cfg.densify_until_iter:
        if (iteration >= cfg.densify_from_iter
                and iteration % cfg.densification_interval == 0):
            max_screen = (cfg.max_screen_size
                          if iteration > cfg.opacity_reset_interval else None)
            res = densify_mod.densify_and_prune(
                state.params, state.stats, key,
                cfg.densify_grad_threshold, 0.005, extent, max_screen,
                cfg.percent_dense)
            state = dataclasses.replace(state, params=res.params,
                                        stats=res.stats)
            state = zero_moments(state, res.moment_reset)
            info = {"cloned": int(res.n_cloned), "split": int(res.n_split),
                    "pruned": int(res.n_pruned),
                    "wanted": int(res.wanted_slots),
                    "granted": int(res.granted_slots)}
        if iteration % cfg.opacity_reset_interval == 0 and iteration > 0:
            params, op_mask = densify_mod.reset_opacity(state.params)
            state = dataclasses.replace(state, params=params)
            state = zero_moments(state, op_mask, fields=("opacity",))
            info["opacity_reset"] = True
    return state, info


def grow_if_needed(state: TrainState, info: dict) -> TrainState:
    """Double capacity when densification ran out of free slots."""
    if info and info.get("granted", 0) < info.get("wanted", 0):
        new_cap = state.params.capacity * 2
        params, stats = densify_mod.grow_capacity(state.params, state.stats,
                                                  new_cap)
        import numpy as np

        def pad_moments(d):
            out = {}
            for f in _FIELDS:
                a = np.asarray(d[f])
                widths = ([(0, new_cap - a.shape[0])]
                          + [(0, 0)] * (a.ndim - 1))
                out[f] = jnp.asarray(np.pad(a, widths))
            return out

        return TrainState(params=params, mu=pad_moments(state.mu),
                          nu=pad_moments(state.nu), stats=stats,
                          step=state.step)
    return state
