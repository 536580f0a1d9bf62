"""Multi-chip orbit rendering: views sharded over the data mesh.

The stage-1/stage-2 pipelines render whole orbit sequences (14+ views
of one scene: ``gen_seq.py``, reference ``gs-simp/gen_seq.py``). On one
chip ``rasterizer.render_views`` dispatches the per-view jit back to
back; across chips the orbit is embarrassingly parallel — parameters
replicate, views shard. This module does exactly that with
``shard_map`` over the mesh's ``data`` axis: each device runs the SAME
single-view render graph (pallas kernels included) over its local view
slice, and no collectives are needed at all — XLA only inserts the
final all-gather implied by the output sharding when the caller
consumes the stacked result.

The view count pads up to a multiple of the mesh size by repeating the
last camera (the pad renders are discarded after unsharding) — static
shapes everywhere, one compile for any orbit length with the same
per-device view count.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rasterizer import RenderCamera, render


def render_views_sharded(params, cameras, bg_color, mesh: Mesh,
                         axis: str = "data", **kwargs):
    """Render ``len(cameras)`` views of one scene, views sharded over
    ``mesh[axis]``; params replicated. Returns the same stacked
    ``RenderOutput`` (leading view dim) as ``rasterizer.render_views``.
    All ``render`` kwargs (backend/pair_budget/tile/...) pass through
    and must be identical across views (one compiled program)."""
    protos = [c if isinstance(c, RenderCamera)
              else RenderCamera.from_camera(c) for c in cameras]
    proto = protos[0]
    n_views = len(protos)
    n_dev = mesh.shape[axis]
    pad = (-n_views) % n_dev
    padded = protos + [protos[-1]] * pad

    wv = jnp.stack([c.world_view for c in padded])   # [V, 4, 4]
    fp = jnp.stack([c.full_proj for c in padded])
    cc = jnp.stack([c.campos for c in padded])

    local = (n_views + pad) // n_dev

    def shard_fn(params, bg, wv, fp, cc):
        outs = []
        for i in range(local):  # static per-device view count
            cam = dataclasses.replace(proto, world_view=wv[i],
                                      full_proj=fp[i], campos=cc[i])
            outs.append(render(params, cam, bg, **kwargs))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    view_spec = P(axis)
    # check_vma off: render() builds unvarying constants (iotas, zero
    # inits) that the varying-manual-axes checker rejects when mixed
    # with sharded operands; the program is still a pure per-shard map.
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), view_spec, view_spec, view_spec),
        out_specs=view_spec, check_vma=False))
    params_r = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
    bg = jax.device_put(jnp.asarray(bg_color, jnp.float32),
                        NamedSharding(mesh, P()))
    shard = NamedSharding(mesh, P(axis))
    out = fn(params_r, bg,
             jax.device_put(wv, shard), jax.device_put(fp, shard),
             jax.device_put(cc, shard))
    if pad:
        out = jax.tree_util.tree_map(lambda x: x[:n_views], out)
    return out
