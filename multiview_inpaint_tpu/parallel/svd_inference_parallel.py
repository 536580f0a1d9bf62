"""Frame-sharded (sequence-parallel) SVD inference.

The reference samples its 14-frame clips on ONE GPU
(``svd_inpaint1/test.py``; DDP is training-only). On a TPU mesh the
clip's frames are the natural parallel axis: every spatial
conv/attention in the VideoUNet + ControlNet is per-frame (time rides
the leading (b t) batch axis, the repo-wide layout), and only the
temporal attention / temporal resblock stacks mix frames — exactly the
reshape points where GSPMD re-shards. So sequence parallelism here is
pure annotation: shard the leading (b t) axis of the latents and every
per-frame conditioning leaf over the mesh, replicate the parameters,
and let XLA's partitioner insert the all-to-alls at the
``(b t) h w c -> (b hw) t c`` transposes. No model changes, no manual
collectives — the same jitted graph serves any mesh size that divides
the frame count (pad frames to a mesh multiple otherwise).

Validated by ``tests/test_svd_inference_parallel.py``: the sharded
apply_model and a full guided sampler run match the single-device
results on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.engine import EngineState, SVDEngine


def replicate_engine_state(state: EngineState, mesh: Mesh) -> EngineState:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), state)


def _shard_frame_leaves(tree, sh: NamedSharding, n_dev: int):
    """Constrain every array leaf whose leading dim is a (b t) frame
    axis (divisible by the mesh) onto the data axis; leave the rest
    (scalars, per-video leaves) to the partitioner."""
    def one(a):
        if (hasattr(a, "ndim") and a.ndim >= 1
                and a.shape[0] % n_dev == 0 and a.shape[0] > 0):
            return jax.lax.with_sharding_constraint(a, sh)
        return a
    return jax.tree_util.tree_map(one, tree)


def make_frame_sharded_denoiser(eng: SVDEngine, state: EngineState,
                                mesh: Mesh, axis: str = "data"):
    """A drop-in replacement for ``eng.denoise_fn(state)`` whose UNet+
    ControlNet forward runs frame-sharded over ``mesh[axis]``. Use with
    any sampler from ``diffusion.samplers`` (their scans trace through
    the sharded forward; sharding propagates across steps)."""
    from ..diffusion import edm

    sh = NamedSharding(mesh, P(axis))
    n_dev = mesh.shape[axis]
    state_r = replicate_engine_state(state, mesh)

    def net_factory(cond):
        def net(x_scaled, c_noise):
            x_scaled = jax.lax.with_sharding_constraint(x_scaled, sh)
            c_noise = _shard_frame_leaves(c_noise, sh, n_dev)
            cond_s = _shard_frame_leaves(cond, sh, n_dev)
            return eng.apply_model(state_r, x_scaled, c_noise, cond_s)
        return net

    def denoise(x, sigmas, cond):
        return edm.denoise(net_factory(cond), x, sigmas,
                           scaling=eng.cfg.scaling)

    return denoise


def frame_sharded_apply_model(eng: SVDEngine, state: EngineState,
                              mesh: Mesh, x: jnp.ndarray,
                              t_noise: jnp.ndarray, cond: Dict,
                              axis: str = "data") -> jnp.ndarray:
    """One frame-sharded UNet+ControlNet forward (see module doc)."""
    sh = NamedSharding(mesh, P(axis))
    n_dev = mesh.shape[axis]
    state_r = replicate_engine_state(state, mesh)

    @jax.jit
    def fwd(x, t_noise, cond):
        x = jax.lax.with_sharding_constraint(x, sh)
        t_noise = _shard_frame_leaves(t_noise, sh, n_dev)
        cond = _shard_frame_leaves(cond, sh, n_dev)
        return eng.apply_model(state_r, x, t_noise, cond)

    return fwd(x, jnp.asarray(t_noise), cond)
