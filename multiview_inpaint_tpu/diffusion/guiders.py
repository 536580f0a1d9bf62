"""Classifier-free-guidance guiders as pure prepare/combine pairs.

Parity with ``sgm/modules/diffusionmodules/guiders.py``: VanillaCFG,
IdentityGuider, LinearPredictionGuider (per-frame CFG scale
linspace(min,max) over the 14 frames, with ``additional_cond_keys`` such
as ``control_hint`` duplicated into the uc|c batch), the no-op
LinearPredictionGuider2 used by the inversion path, and
TrianglePredictionGuider.

Conditioning is a flat dict of arrays; ``prepare`` builds the (possibly
doubled) network batch, ``combine`` folds the prediction back.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

_BUILTIN_KEYS = ("vector", "crossattn", "concat")


def _cat_conds(c: Dict, uc: Dict, keys) -> Dict:
    out = {}
    for k in c:
        if k in keys:
            out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        else:
            out[k] = c[k]
    return out


@dataclasses.dataclass(frozen=True)
class VanillaCFG:
    scale: float = 1.0
    additional_cond_keys: Tuple[str, ...] = ()

    def prepare(self, x, s, c, uc):
        keys = _BUILTIN_KEYS + tuple(self.additional_cond_keys)
        return (jnp.concatenate([x, x]), jnp.concatenate([s, s]),
                _cat_conds(c, uc, keys))

    def combine(self, out, sigma):
        x_u, x_c = jnp.split(out, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)


@dataclasses.dataclass(frozen=True)
class IdentityGuider:
    def prepare(self, x, s, c, uc):
        return x, s, dict(c)

    def combine(self, out, sigma):
        return out


@dataclasses.dataclass(frozen=True)
class LinearPredictionGuider:
    max_scale: float = 2.5
    num_frames: int = 14
    min_scale: float = 1.0
    additional_cond_keys: Tuple[str, ...] = ("control_hint",)

    def frame_scales(self) -> jnp.ndarray:
        return jnp.linspace(self.min_scale, self.max_scale, self.num_frames)

    def prepare(self, x, s, c, uc):
        keys = _BUILTIN_KEYS + tuple(self.additional_cond_keys)
        return (jnp.concatenate([x, x]), jnp.concatenate([s, s]),
                _cat_conds(c, uc, keys))

    def combine(self, out, sigma):
        x_u, x_c = jnp.split(out, 2, axis=0)
        t = self.num_frames
        b = x_u.shape[0] // t
        shape = (b, t) + (1,) * (x_u.ndim - 1)
        scale = jnp.tile(self.frame_scales(), b).reshape(shape)
        x_u = x_u.reshape((b, t) + x_u.shape[1:])
        x_c = x_c.reshape((b, t) + x_c.shape[1:])
        mixed = x_u + scale * (x_c - x_u)
        return mixed.reshape((b * t,) + mixed.shape[2:])


@dataclasses.dataclass(frozen=True)
class LinearPredictionGuider2(LinearPredictionGuider):
    """No-op guider for the DDIM-inversion path (single batch, c only)."""

    def prepare(self, x, s, c, uc):
        return x, s, dict(c)

    prepare_inv = prepare

    def combine(self, out, sigma):
        return out


@dataclasses.dataclass(frozen=True)
class TrianglePredictionGuider(LinearPredictionGuider):
    period: Tuple[float, ...] = (1.0,)
    period_fusing: str = "max"

    def frame_scales(self) -> jnp.ndarray:
        values = jnp.linspace(0, 1, self.num_frames)

        def tri(p):
            return 2 * jnp.abs(values / p - jnp.floor(values / p + 0.5))

        scales = jnp.stack([tri(p) for p in self.period])
        if self.period_fusing == "mean":
            s = scales.mean(0)
        elif self.period_fusing == "multiply":
            s = scales.prod(0)
        else:
            s = scales.max(0)
        return s * (self.max_scale - self.min_scale) + self.min_scale
