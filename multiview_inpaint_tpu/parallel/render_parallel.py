"""Multi-chip rendering: orbit views or single-frame bands over a mesh.

Two shardings, both over the mesh's ``data`` axis with parameters
replicated and ZERO collectives (XLA only inserts the all-gather
implied by the output sharding when the caller consumes the result):

- ``render_views_sharded`` — the stage-1/stage-2 pipelines render whole
  orbit sequences (14+ views of one scene: ``gen_seq.py``, reference
  ``gs-simp/gen_seq.py``). On one chip ``rasterizer.render_views``
  dispatches the per-view jit back to back; across chips the orbit is
  embarrassingly parallel: views shard, each device runs the SAME
  single-view render graph (pallas kernels included) over its local
  slice. The view count pads up to a mesh multiple by repeating the
  last camera (pad renders discarded after unsharding) — static shapes,
  one compile for any orbit length with the same per-device count.

- ``render_frame_sharded`` — ONE frame's tile rows shard into
  horizontal bands (latency scaling for large frames, e.g. 1080p live
  view). Every device projects the full scene (N-proportional work
  replicates — it is ~1 ms of the 19 ms 1080p frame) and then bins,
  sorts, gathers and composites only its band (the pair-proportional
  ~16 ms, which is what shrinks /D). Band pixels are BIT-IDENTICAL to
  the full-frame render: rects are intersected with the band in integer
  tile space and the composite kernels shift their tile origin to
  global coordinates (``render(band_rows=, band_row0=)``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rasterizer import RenderCamera, render


# Compiled shard_map programs, keyed on everything that shapes the
# trace: rebuilding jax.jit(shard_map(<fresh closure>)) per call would
# recompile the whole sharded render each invocation (20s-minutes on
# the axon TPU) — render.py's group loop and per-frame band rendering
# both call these repeatedly with identical statics.
_SHARDED_FN_CACHE: dict = {}


def _camera_statics(c: RenderCamera):
    return (c.width, c.height, c.tan_fovx, c.tan_fovy)


def _views_fn(mesh, axis, local, proto, kwargs):
    key = ("views", mesh, axis, local, _camera_statics(proto),
           tuple(sorted(kwargs.items())))
    if key in _SHARDED_FN_CACHE:
        return _SHARDED_FN_CACHE[key]

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
    _SHARDED_FN_CACHE[key] = fn
    return fn


def render_views_sharded(params, cameras, bg_color, mesh: Mesh,
                         axis: str = "data", **kwargs):
    """Render ``len(cameras)`` views of one scene, views sharded over
    ``mesh[axis]``; params replicated. Returns the same stacked
    ``RenderOutput`` (leading view dim) as ``rasterizer.render_views``.
    All ``render`` kwargs (backend/pair_budget/tile/...) pass through;
    camera statics (size, FOV) must be uniform — the compiled program
    bakes view 0's (raises otherwise, like ``render_views``)."""
    protos = [c if isinstance(c, RenderCamera)
              else RenderCamera.from_camera(c) for c in cameras]
    proto = protos[0]
    if len({_camera_statics(c) for c in protos}) > 1:
        raise ValueError("render_views_sharded needs uniform camera "
                         "statics (width, height, tan_fovx, tan_fovy)")
    n_views = len(protos)
    n_dev = mesh.shape[axis]
    pad = (-n_views) % n_dev
    padded = protos + [protos[-1]] * pad

    wv = jnp.stack([c.world_view for c in padded])   # [V, 4, 4]
    fp = jnp.stack([c.full_proj for c in padded])
    cc = jnp.stack([c.campos for c in padded])

    local = (n_views + pad) // n_dev
    fn = _views_fn(mesh, axis, local, proto, kwargs)
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


def render_frame_sharded(params, camera, bg_color, mesh: Mesh,
                         axis: str = "data", interleaved: bool = True,
                         **kwargs):
    """Render ONE view with its tile rows sharded over ``mesh[axis]``
    (params replicated, no collectives). Returns the same
    ``RenderOutput`` as single-device ``render`` — rgb/depth/alpha are
    the stitched bands, radii/visibility come from band 0 (projection
    is replicated, so every band computes the same values), ``pairs``
    is the summed true pair count (every gaussian-tile pair lives in
    exactly one band, so the sum equals the full-frame total) and
    ``expand_needed`` the per-band max.

    ``interleaved`` (default): device d owns tile rows d, d+D, d+2D...
    — adjacent rows carry similar splat loads, so per-device work
    balances to ~1/D of the frame (contiguous horizontal bands measured
    15x pair imbalance between the frame center and edges on the 1080p
    bench scene). ``interleaved=False`` keeps contiguous bands.

    ``pair_budget``/``max_per_tile`` apply PER BAND: a band holds ~1/D
    of the frame's pairs, so the per-band budget can shrink accordingly
    (interleaving makes ~1/D tight; contiguous bands need slack for
    uneven vertical splat distributions). ``cull_n`` passes through the
    same way (per-band N-culling): an interleaved band touches roughly
    ``N_active/D`` gaussians (a splat spanning ``h`` tile rows hits a
    stride-D band with probability ~min(1, h/D)), so shrinking the cull
    capacity accordingly removes the replicated N-proportional gather
    floor — the lever that keeps band sharding scaling past 8 chips.
    Overflow reports in ``cull_needed`` like the other budgets."""
    cam = (camera if isinstance(camera, RenderCamera)
           else RenderCamera.from_camera(camera))
    tile_h = kwargs.get("tile", (16, 16))[0]
    n_dev = mesh.shape[axis]
    tiles_y = -(-cam.height // tile_h)
    band_rows = -(-tiles_y // n_dev)
    stride = n_dev if interleaved else 1
    row0s = (jnp.arange(n_dev, dtype=jnp.int32) if interleaved
             else jnp.arange(n_dev, dtype=jnp.int32) * band_rows)

    key = ("frame", mesh, axis, band_rows, stride,
           _camera_statics(cam), tuple(sorted(kwargs.items())))
    fn = _SHARDED_FN_CACHE.get(key)
    if fn is None:
        def shard_fn(params, bg, wv, fp, cc, row0):
            # camera pose rides as replicated operands (NOT baked
            # constants: the cached program must serve any pose with
            # these statics)
            c = dataclasses.replace(cam, world_view=wv,
                                    full_proj=fp, campos=cc)
            out = render(params, c, bg, band_rows=band_rows,
                         band_row0=row0[0], band_stride=stride,
                         **kwargs)
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(x)[None], out)

        fn = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(axis)),
            out_specs=P(axis), check_vma=False))
        _SHARDED_FN_CACHE[key] = fn
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    params_r = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), params)
    bg = jax.device_put(jnp.asarray(bg_color, jnp.float32), rep)
    out = fn(params_r, bg,
             jax.device_put(cam.world_view, rep),
             jax.device_put(cam.full_proj, rep),
             jax.device_put(cam.campos, rep),
             jax.device_put(row0s, shard))

    h, w = cam.height, cam.width

    def stitch(x):
        # [D, band_rows*tile_h, ...] -> [H, ...]: interleaved bands
        # re-interleave tile rows (global row = l*D + d), contiguous
        # bands concatenate.
        tail = x.shape[2:]
        if interleaved:
            x = x.reshape((n_dev, band_rows, tile_h) + tail)
            x = jnp.swapaxes(x, 0, 1)        # [band_rows, D, tile_h, ..]
        return x.reshape((n_dev * band_rows * tile_h,) + tail)[:h]

    return out._replace(
        rgb=stitch(out.rgb), depth=stitch(out.depth),
        alpha=stitch(out.alpha),
        radii=out.radii[0], visibility=out.visibility[0],
        pairs=out.pairs.sum(), pad_pairs=out.pad_pairs.sum(),
        expand_needed=out.expand_needed.max(),
        cull_needed=jnp.asarray(out.cull_needed).max())
