"""Full trainer-state checkpointing (params + Adam moments + step).

Equivalent of the reference's ``torch.save((gaussians.capture(), iter))``
(``gs-simp/train.py:130-132``, ``gaussian_model.py:61-93``) as a compressed
npz; the PLY writer remains the inter-stage contract, this is for resume.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.gs_trainer import TrainState, _FIELDS
from .densify import DensifyStats
from .gaussians import GaussianParams


def save_train_state(path: str, state: TrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = {}
    for f in _FIELDS:
        arrs[f"param_{f}"] = np.asarray(getattr(state.params, f))
        arrs[f"mu_{f}"] = np.asarray(state.mu[f])
        arrs[f"nu_{f}"] = np.asarray(state.nu[f])
    arrs["live"] = np.asarray(state.params.live)
    arrs["grad_accum"] = np.asarray(state.stats.grad_accum)
    arrs["denom"] = np.asarray(state.stats.denom)
    arrs["max_radii2d"] = np.asarray(state.stats.max_radii2d)
    arrs["step"] = np.asarray(state.step)
    np.savez_compressed(path, **arrs)


def load_train_state(path: str) -> TrainState:
    z = np.load(path)
    params = GaussianParams(
        live=jnp.asarray(z["live"]),
        **{f: jnp.asarray(z[f"param_{f}"]) for f in _FIELDS})
    return TrainState(
        params=params,
        mu={f: jnp.asarray(z[f"mu_{f}"]) for f in _FIELDS},
        nu={f: jnp.asarray(z[f"nu_{f}"]) for f in _FIELDS},
        stats=DensifyStats(grad_accum=jnp.asarray(z["grad_accum"]),
                           denom=jnp.asarray(z["denom"]),
                           max_radii2d=jnp.asarray(z["max_radii2d"])),
        step=jnp.asarray(z["step"]),
    )
