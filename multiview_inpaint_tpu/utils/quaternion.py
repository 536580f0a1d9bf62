"""Quaternion / covariance helpers, JAX-native and batched.

Same parameterization as the reference gaussians
(``gs-simp/utils/general_utils.py:80-112``): unnormalized quaternion
(r, x, y, z) -> rotation matrix; covariance factor L = R @ diag(scale).
All functions map over a leading batch dim and fuse under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] unnormalized quaternion (w, x, y, z) -> [N, 3, 3] rotation."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): [N,3] scale, [N,4] quat -> [N,3,3] factor."""
    R = quat_to_rotmat(q)
    return R * scale[..., None, :]


def covariance_from_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray,
                                     scaling_modifier: float = 1.0
                                     ) -> jnp.ndarray:
    """Full 3D covariance Sigma = L L^T, [N, 3, 3]."""
    L = scaling_rotation(scaling_modifier * scale, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] symmetric -> [N,6] upper-triangular (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)
