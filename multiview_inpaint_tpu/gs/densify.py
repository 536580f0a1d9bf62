"""Adaptive density control on fixed-capacity buffers — fully jittable.

Capability parity with the reference's densification
(``gs-simp/scene/gaussian_model.py:426-484`` + the optimizer surgery at
:335-404) redesigned for XLA's static shapes:

- The gaussian buffer never changes shape. Pruned rows flip ``live`` off;
  clone/split write into dead slots located by a stable argsort (free slots
  in index order — no host round trip, no atomics).
- Splits follow the reference recipe: original row is **replaced in place**
  by one resample and a second resample lands in a free slot (statistically
  identical to "append 2, prune original", but costs one slot instead of
  two).
- Optimizer-moment "surgery" becomes a masked zeroing of Adam moments on
  every written row (the reference concatenates zero moments for new rows).
- Capacity pressure is returned (``wanted`` vs ``granted``) so the trainer
  can double the buffers and re-jit — growth happens a handful of times per
  run instead of a reallocation every 100 iters.

Screen-space gradient statistics (``xyz_gradient_accum``/``denom``/
``max_radii2D``) live in :class:`DensifyStats` and are accumulated by the
trainer from the rasterizer's ``means2d_offset`` gradient and radii.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.quaternion import quat_to_rotmat
from ..utils.schedules import inverse_sigmoid
from .gaussians import GaussianParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    grad_accum: jnp.ndarray   # [C] sum of screen-space grad norms
    denom: jnp.ndarray        # [C] number of visible accumulations
    max_radii2d: jnp.ndarray  # [C] int32 max screen radius seen

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        return cls(grad_accum=jnp.zeros((capacity,), jnp.float32),
                   denom=jnp.zeros((capacity,), jnp.float32),
                   max_radii2d=jnp.zeros((capacity,), jnp.int32))

    def update(self, means2d_grad: jnp.ndarray, radii: jnp.ndarray,
               visibility: jnp.ndarray) -> "DensifyStats":
        """Per-iteration accumulation (``add_densification_stats``)."""
        norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
        return DensifyStats(
            grad_accum=self.grad_accum + jnp.where(visibility, norm, 0.0),
            denom=self.denom + visibility.astype(jnp.float32),
            max_radii2d=jnp.maximum(self.max_radii2d,
                                    jnp.where(visibility, radii, 0)),
        )


class DensifyResult(NamedTuple):
    params: GaussianParams
    moment_reset: jnp.ndarray  # [C] bool — rows whose Adam moments to zero
    stats: DensifyStats        # reset to zeros
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    wanted_slots: jnp.ndarray  # how many free slots we needed
    granted_slots: jnp.ndarray  # how many we had


def _scatter_rows(params: GaussianParams, dest: jnp.ndarray,
                  src: GaussianParams, src_mask: jnp.ndarray,
                  field_overrides: dict) -> GaussianParams:
    """Write src rows (where src_mask) into ``dest`` slots (OOB -> drop)."""
    cap = params.capacity
    dest = jnp.where(src_mask, dest, cap)  # out-of-bounds == dropped
    out = {}
    for f in ("xyz", "features_dc", "features_rest", "opacity", "scaling",
              "rotation"):
        val = field_overrides.get(f, getattr(src, f))
        out[f] = getattr(params, f).at[dest].set(val, mode="drop")
    live = params.live.at[dest].set(True, mode="drop")
    return GaussianParams(live=live, **out)


@partial(jax.jit, static_argnames=("max_screen_size",))
def densify_and_prune(params: GaussianParams, stats: DensifyStats,
                      key: jax.Array, grad_threshold: float,
                      min_opacity: float, extent: float,
                      max_screen_size: int | None,
                      percent_dense: float = 0.01) -> DensifyResult:
    cap = params.capacity
    live = params.live
    act_scale = params.act_scaling()
    max_scale = jnp.max(act_scale, axis=-1)

    # Quarantine rows whose params went non-finite (diverged optimizer
    # step, overflowed activation): they render nothing (the projector
    # culls them) and must never be cloned/split — resampling from a
    # NaN parent spreads the poison. They are pruned so the slot
    # recycles.
    row_finite = (jnp.isfinite(params.xyz).all(axis=-1)
                  & jnp.isfinite(params.scaling).all(axis=-1)
                  & jnp.isfinite(params.opacity[:, 0])
                  & jnp.isfinite(params.rotation).all(axis=-1)
                  & jnp.isfinite(stats.grad_accum))

    grads = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    hot = live & row_finite & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # --- prune ----------------------------------------------------------
    prune = live & (~row_finite
                    | (params.act_opacity()[:, 0] < min_opacity))
    if max_screen_size is not None:
        prune = prune | (live & (stats.max_radii2d > max_screen_size))
        prune = prune | (live & (max_scale > 0.1 * extent))
    prune = prune & ~split_mask  # split rows are rewritten in place anyway
    live_after = live & ~prune

    # --- allocate free slots -------------------------------------------
    free = ~live_after
    # Free slots in index order: argsort of (not free) is stable in XLA.
    slot_by_rank = jnp.argsort(~free, stable=True)
    n_free = jnp.sum(free)

    clone_rank = jnp.cumsum(clone_mask) - 1
    n_clone_wanted = jnp.sum(clone_mask)
    split_rank = jnp.cumsum(split_mask) - 1
    wanted = n_clone_wanted + jnp.sum(split_mask)

    clone_ok = clone_mask & (clone_rank < n_free)
    clone_dest = slot_by_rank[jnp.clip(clone_rank, 0, cap - 1)]

    split2_rank = n_clone_wanted + split_rank
    split2_ok = split_mask & (split2_rank < n_free)
    split2_dest = slot_by_rank[jnp.clip(split2_rank, 0, cap - 1)]

    # --- build split resamples (2 per split row) ------------------------
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(params.act_rotation())  # [C,3,3]

    def resample(k):
        eps = jax.random.normal(k, (cap, 3)) * act_scale
        return params.xyz + jnp.einsum("nij,nj->ni", R, eps)

    new_xyz1 = resample(k1)
    new_xyz2 = resample(k2)
    new_scaling = jnp.log(jnp.maximum(act_scale / (0.8 * 2), 1e-12))

    p = params
    live_p = GaussianParams(
        xyz=p.xyz, features_dc=p.features_dc, features_rest=p.features_rest,
        opacity=jnp.where(prune[:, None], -15.0, p.opacity),
        scaling=p.scaling, rotation=p.rotation, live=live_after)

    # split sample 1 replaces the original row in place
    split_inplace = GaussianParams(
        xyz=jnp.where(split_mask[:, None], new_xyz1, live_p.xyz),
        features_dc=live_p.features_dc,
        features_rest=live_p.features_rest,
        opacity=live_p.opacity,
        scaling=jnp.where(split_mask[:, None], new_scaling, live_p.scaling),
        rotation=live_p.rotation,
        live=live_p.live,
    )

    # clone copies into free slots
    after_clone = _scatter_rows(split_inplace, clone_dest, params,
                                clone_ok, {})
    # split sample 2 into free slots
    after_split = _scatter_rows(
        after_clone, split2_dest, params, split2_ok,
        {"xyz": new_xyz2, "scaling": new_scaling})

    # Rows needing zeroed Adam moments: every written row.
    moment_reset = jnp.zeros((cap,), bool)
    moment_reset = moment_reset | split_mask | prune
    moment_reset = moment_reset.at[jnp.where(clone_ok, clone_dest, cap)].set(
        True, mode="drop")
    moment_reset = moment_reset.at[jnp.where(split2_ok, split2_dest,
                                             cap)].set(True, mode="drop")

    return DensifyResult(
        params=after_split,
        moment_reset=moment_reset,
        stats=DensifyStats.zeros(cap),
        n_cloned=jnp.sum(clone_ok),
        n_split=jnp.sum(split_mask),
        n_pruned=jnp.sum(prune),
        wanted_slots=wanted,
        granted_slots=jnp.minimum(wanted, n_free),
    )


@jax.jit
def reset_opacity(params: GaussianParams) -> tuple[GaussianParams,
                                                   jnp.ndarray]:
    """Clamp opacity to <= 0.01 (reference ``reset_opacity``).

    Returns new params and the moment-reset mask (opacity moments zeroed).
    """
    target = inverse_sigmoid(jnp.asarray(0.01, jnp.float32))
    new_op = jnp.minimum(params.opacity, target)
    new_op = jnp.where(params.live[:, None], new_op, params.opacity)
    return (dataclasses.replace(params, opacity=new_op),
            params.live)


def grow_capacity(params: GaussianParams, stats: DensifyStats,
                  new_capacity: int) -> tuple[GaussianParams, DensifyStats]:
    """Host-side buffer growth (pads with dead rows; triggers re-jit)."""
    import numpy as np

    def pad(a, fill=0.0):
        a = np.asarray(a)
        widths = [(0, new_capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    p = GaussianParams(
        xyz=jnp.asarray(pad(params.xyz)),
        features_dc=jnp.asarray(pad(params.features_dc)),
        features_rest=jnp.asarray(pad(params.features_rest)),
        opacity=jnp.asarray(pad(params.opacity, -15.0)),
        scaling=jnp.asarray(pad(params.scaling, -15.0)),
        rotation=jnp.asarray(pad(params.rotation)),
        live=jnp.asarray(pad(params.live, False)),
    )
    s = DensifyStats(
        grad_accum=jnp.asarray(pad(stats.grad_accum)),
        denom=jnp.asarray(pad(stats.denom)),
        max_radii2d=jnp.asarray(pad(stats.max_radii2d)),
    )
    return p, s
