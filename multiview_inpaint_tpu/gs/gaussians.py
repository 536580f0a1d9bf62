"""Gaussian scene parameters as a padded, jit-stable pytree.

Capability parity with ``GaussianModel``
(``gs-simp/scene/gaussian_model.py:26-147,191-309``) redesigned for XLA:

- Parameters live in **fixed-capacity** arrays with a ``live`` mask instead
  of dynamically-sized tensors. Densify/prune (see ``densify.py``) edit rows
  in place with masked scatters, so every training step keeps a static shape
  and jit never retraces mid-run; capacity grows on a doubling schedule
  (retrace only on growth, a handful of times per run).
- Activations (sigmoid opacity, exp scale, normalized quaternion) are pure
  functions applied where consumed, not stateful methods.
- SH features are stored [N, K, 3] coefficient-major like the reference so
  PLY round-trips are byte-exact.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_mean_sq_dist
from ..utils import sh as sh_utils
from ..utils.schedules import inverse_sigmoid
from . import ply_io


@dataclasses.dataclass(frozen=True)
class GaussianConfig:
    max_sh_degree: int = 0  # reference default for this pipeline
    capacity: int = 0  # 0 = size to the initial point count


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable state. All leading dims == capacity (padded)."""
    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, M, 3], M = (deg+1)^2 - 1
    opacity: jnp.ndarray        # [C, 1] raw logit
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] unnormalized quaternion
    live: jnp.ndarray           # [C] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        return int(round((self.features_rest.shape[1] + 1) ** 0.5)) - 1

    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live)

    def features(self) -> jnp.ndarray:
        """[C, (deg+1)^2, 3] full SH stack."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    # --- activations -----------------------------------------------------
    def act_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def act_scaling(self) -> jnp.ndarray:
        # Clamped exp: an unbounded log-scale param can drift past f32
        # overflow under long Adam schedules (exp(s)^2 enters the EWA
        # covariance, which overflows at s ~ 44) — the clamp saturates
        # the activation (and its gradient) far above any physical
        # scene scale instead. Identity for s <= 20.
        return jnp.exp(jnp.minimum(self.scaling, 20.0))

    def act_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True).clip(1e-12)


def _pad_to(arr: jnp.ndarray, capacity: int, fill: float = 0.0) -> jnp.ndarray:
    pad = [(0, capacity - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=fill)


def from_arrays(xyz, features_dc, features_rest, opacity, scaling, rotation,
                capacity: Optional[int] = None) -> GaussianParams:
    n = xyz.shape[0]
    capacity = capacity or n
    assert capacity >= n
    live = jnp.arange(capacity) < n
    return GaussianParams(
        xyz=_pad_to(jnp.asarray(xyz, jnp.float32), capacity),
        features_dc=_pad_to(jnp.asarray(features_dc, jnp.float32), capacity),
        features_rest=_pad_to(jnp.asarray(features_rest, jnp.float32), capacity),
        # Dead rows keep a very negative opacity logit so any code path that
        # forgets the live mask still composites them at ~zero alpha.
        opacity=_pad_to(jnp.asarray(opacity, jnp.float32), capacity, -15.0),
        scaling=_pad_to(jnp.asarray(scaling, jnp.float32), capacity, -15.0),
        rotation=_pad_to(jnp.asarray(rotation, jnp.float32), capacity).at[n:, 0].set(1.0),
        live=live,
    )


def create_from_pcd(points: np.ndarray, colors: np.ndarray,
                    config: GaussianConfig,
                    capacity: Optional[int] = None) -> GaussianParams:
    """Initialize from a COLMAP point cloud.

    Same recipe as the reference ``create_from_pcd``
    (``gaussian_model.py:124-147``): DC = RGB2SH(color), isotropic log-scale
    from sqrt(mean 3-NN squared distance), identity quaternion,
    opacity = logit(0.1).
    """
    n = points.shape[0]
    deg = config.max_sh_degree
    m = (deg + 1) ** 2 - 1
    dc = sh_utils.rgb_to_sh(jnp.asarray(colors, jnp.float32)).reshape(n, 1, 3)
    rest = jnp.zeros((n, m, 3), jnp.float32)
    d2 = jnp.clip(knn_mean_sq_dist(jnp.asarray(points, jnp.float32)), 1e-7)
    scales = jnp.log(jnp.sqrt(d2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    return from_arrays(jnp.asarray(points, jnp.float32), dc, rest, opac,
                       scales, rots, capacity=capacity or config.capacity or n)


# --- PLY checkpointing (inter-stage contract) ----------------------------

def save_ply(params: GaussianParams, path: str) -> None:
    """Write only live rows, byte-compatible with the reference format."""
    live = np.asarray(params.live)
    idx = np.nonzero(live)[0]
    ply_io.save_gaussian_ply(
        path,
        np.asarray(params.xyz)[idx],
        np.asarray(params.features_dc)[idx],
        np.asarray(params.features_rest)[idx],
        np.asarray(params.opacity)[idx],
        np.asarray(params.scaling)[idx],
        np.asarray(params.rotation)[idx],
    )


def load_ply(path: str, max_sh_degree: int,
             capacity: Optional[int] = None) -> GaussianParams:
    d = ply_io.load_gaussian_ply(path, max_sh_degree)
    return from_arrays(d["xyz"], d["features_dc"], d["features_rest"],
                       d["opacity"], d["scaling"], d["rotation"],
                       capacity=capacity)
