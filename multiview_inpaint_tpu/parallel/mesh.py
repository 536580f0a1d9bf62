"""Device mesh + sharding helpers.

The reference's only distribution strategy is PyTorch-Lightning DDP with a
gloo backend (SURVEY.md §2.6). The TPU-native equivalent: a
``jax.sharding.Mesh`` over ICI, batch arrays sharded on the ``data`` axis,
parameters replicated, XLA inserting the gradient ``psum`` — no explicit
communication layer at all. A ``model`` axis is pre-declared for future
tensor sharding of the diffusion stack.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    grid = np.array(devs[:n]).reshape(shape)
    return Mesh(grid, axes)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Shard leading dim of every leaf over the mesh axis."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, x)


def replicate(x, mesh: Mesh):
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, x)
