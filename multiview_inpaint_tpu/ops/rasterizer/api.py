"""Public differentiable rasterizer API.

The TPU-native equivalent of the reference's
``GaussianRasterizer(...) -> (image, radii, depth)`` plus the render-dict
wrapper (``gs-simp/gaussian_renderer/__init__.py:18-101``): one function,

    out = render(params, camera, bg_color, ...)

returning ``RenderOutput(rgb [H,W,3], depth [H,W], alpha [H,W],
radii [N], visibility [N])`` — differentiable w.r.t. every gaussian
attribute, plus ``means2d_offset`` for the screen-space gradient signal
consumed by densification.

Static-shape knobs (jit specializes on them):
- ``tile`` (h, w): binning granularity, default 16x16 like the CUDA kernel;
- ``pair_budget``: total gaussian-tile pairs (default 8N);
- ``max_per_tile``: splats composited per tile (default 1024);
- ``chunk``: splats per scan step (default 128 — one full VPU lane row).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...gs.gaussians import GaussianParams
from . import (binning, composite, geometry, pallas_backward,
               pallas_composite, segment_reduce)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _pallas_composite_diff(tiles_x, tiles_y, tile_h, tile_w, interpret,
                           attrs_t, seg_start_f, counts_f, row0_f):
    """Differentiable fused compositing: forward = pallas kernel
    emitting RAW tiles (bg-free accumulators + final T; the caller
    composites the background in XLA, whose autodiff supplies the
    bg/depth-sentinel terms of the row-4 cotangent), backward = pallas
    backward kernel producing pair-space attr grads (segment ints and
    the band row offset ride as f32 across the custom_vjp boundary)."""
    zero_bg = jnp.zeros((3,), jnp.float32)
    return pallas_composite.composite_pallas(
        attrs_t, seg_start_f.astype(jnp.int32), counts_f.astype(jnp.int32),
        zero_bg, tiles_x, tiles_y, tile_h, tile_w, interpret=interpret,
        row0=row0_f.astype(jnp.int32))


def _pcd_fwd(tiles_x, tiles_y, tile_h, tile_w, interpret, attrs_t,
             seg_start_f, counts_f, row0_f):
    tiles8 = _pallas_composite_diff(tiles_x, tiles_y, tile_h, tile_w,
                                    interpret, attrs_t, seg_start_f,
                                    counts_f, row0_f)
    return tiles8, (attrs_t, seg_start_f, counts_f, row0_f, tiles8)


def _pcd_bwd(tiles_x, tiles_y, tile_h, tile_w, interpret, res, g):
    attrs_t, seg_start_f, counts_f, row0_f, tiles8 = res
    zero_bg = jnp.zeros((3,), jnp.float32)
    d_attrs = pallas_backward.composite_pallas_bwd(
        attrs_t, seg_start_f.astype(jnp.int32),
        counts_f.astype(jnp.int32), zero_bg, tiles8, g, tiles_x, tiles_y,
        tile_h, tile_w, interpret=interpret,
        row0=row0_f.astype(jnp.int32))
    return (d_attrs, jnp.zeros_like(seg_start_f),
            jnp.zeros_like(counts_f), jnp.zeros_like(row0_f))


_pallas_composite_diff.defvjp(_pcd_fwd, _pcd_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderCamera:
    """Device-side camera constants for one view."""
    world_view: jnp.ndarray  # [4,4]
    full_proj: jnp.ndarray   # [4,4]
    campos: jnp.ndarray      # [3]
    tan_fovx: float = dataclasses.field(metadata=dict(static=True))
    tan_fovy: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_camera(cls, cam) -> "RenderCamera":
        """From a ``gs.cameras.Camera``."""
        return cls(world_view=jnp.asarray(cam.world_view),
                   full_proj=jnp.asarray(cam.full_proj),
                   campos=jnp.asarray(cam.camera_center),
                   tan_fovx=cam.tan_half_fovx, tan_fovy=cam.tan_half_fovy,
                   width=cam.width, height=cam.height)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray      # [H, W, 3]
    depth: jnp.ndarray    # [H, W]
    alpha: jnp.ndarray    # [H, W]
    radii: jnp.ndarray    # [N] int32
    visibility: jnp.ndarray  # [N] bool (radii > 0)
    # true gaussian-tile pair count; > pair_budget means pairs were
    # clipped this frame and the caller should grow the budget (the CUDA
    # reference allocates num_rendered exactly; we grow like capacity).
    pairs: jnp.ndarray = 0
    # alignment-padding count: always 0 on the packed pallas path
    # (unaligned segments, round 3); nonzero only on the generic
    # non-packed fallback layout.
    pad_pairs: jnp.ndarray = 0
    # smallest valid pair-expansion window for this frame (pallas path);
    # > the static ``expand_window`` means this frame's binning was
    # corrupted and the caller must re-render with a bigger window
    # (grow-and-re-jit, exactly like ``pairs`` vs ``pair_budget``).
    expand_needed: jnp.ndarray = 0
    # true active (pair-emitting) gaussian count when ``cull_n`` is set
    # (0 otherwise); > cull_n means actives were dropped — re-render
    # with a bigger cull capacity (grow-and-re-jit).
    cull_needed: jnp.ndarray = 0


def _tile_pixel_coords(tiles_x: int, tiles_y: int, tile_w: int,
                       tile_h: int) -> jnp.ndarray:
    """[T, P, 2] pixel coordinates for every tile."""
    ty, tx = np.mgrid[0:tiles_y, 0:tiles_x]
    origin = np.stack([tx.reshape(-1) * tile_w, ty.reshape(-1) * tile_h],
                      axis=-1)  # [T, 2]
    ly, lx = np.mgrid[0:tile_h, 0:tile_w]
    local = np.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1)  # [P, 2]
    return jnp.asarray((origin[:, None, :] + local[None, :, :]).astype(
        np.float32))


def _assemble(tiles: jnp.ndarray, tiles_x: int, tiles_y: int, tile_w: int,
              tile_h: int, width: int, height: int) -> jnp.ndarray:
    """[T, P, C?] tile blocks -> [H, W, C?] image (crop padding)."""
    ch = tiles.shape[2:]
    img = tiles.reshape((tiles_y, tiles_x, tile_h, tile_w) + ch)
    img = jnp.moveaxis(img, 2, 1)  # [ty, th, tx, tw, ...]
    img = img.reshape((tiles_y * tile_h, tiles_x * tile_w) + ch)
    return img[:height, :width]


@partial(jax.jit, static_argnames=("sh_degree", "tile", "pair_budget",
                                   "max_per_tile", "chunk", "backend",
                                   "interpret", "expand_window",
                                   "band_rows", "band_stride", "cull_n",
                                   "force_wide", "wide_mode"))
def render(params: GaussianParams, camera: RenderCamera,
           bg_color: jnp.ndarray, sh_degree: int = 0,
           scaling_modifier: float = 1.0,
           means2d_offset: Optional[jnp.ndarray] = None,
           tile: tuple[int, int] = (16, 16),
           pair_budget: Optional[int] = None,
           max_per_tile: int = 1024,
           chunk: int = 128, backend: str = "xla",
           interpret: bool = False,
           expand_window: int = 0,
           band_rows: Optional[int] = None,
           band_row0: Optional[jnp.ndarray] = None,
           band_stride: int = 1,
           cull_n: Optional[int] = None,
           force_wide: bool = False,
           wide_mode: str = "auto") -> RenderOutput:
    """Render one view.

    ``backend``: "xla" (default) or "pallas" (fused TPU kernels with
    per-tile early exit). Both are fully differentiable; the pallas path
    uses a custom VJP whose backward is a second fused kernel emitting
    pair-space attribute gradients (reduced to gaussians by the gather's
    own VJP).

    ``pair_budget`` (pallas backend) must stay <=
    ``pair_expand.MAX_PAIR_BUDGET`` (~16.7M — slot indices ride bf16
    mask-split channels below the sentinel). Wide (tile, rank) keys
    remove the N cap, but adaptive budget-doubling loops must clamp to
    that bound (bench.py does); ~6-7M gaussians at the measured ~2.3
    pairs/gaussian fit under it.

    Band mode (single-frame multi-chip sharding, see
    ``parallel.render_parallel.render_frame_sharded``): ``band_rows``
    (static) renders only the tile rows ``band_row0 + l*band_stride``
    (l = 0..band_rows-1; the offset is a traced int32 scalar — one
    executable serves every band). Stride 1 is a contiguous horizontal
    band; stride D with offsets 0..D-1 gives INTERLEAVED bands, which
    load-balance across devices (adjacent rows carry similar splat
    loads, contiguous bands can differ 15x). Projection stays
    full-frame; binning intersects rects with the row set in integer
    space; the composite kernels map local rows to global origins.
    Per-tile splat COVERAGE AND ORDER are exactly the full frame's; on
    the xla backend band pixels are BIT-IDENTICAL to the corresponding
    full-frame rows, while the pallas backend regroups each segment at
    different 128-lane chunk boundaries (the segment's pair offset is
    band-local), shifting f32 accumulation order by ≲2e-6 — well
    inside its cross-backend tolerance. Output images hold the band's
    rows in LOCAL order (``band_rows*tile_h`` rows; the caller
    stitches/interleaves bands then crops to the frame height).

    ``cull_n`` (static, per-band N-culling): cap the depth-rank
    compaction at ``cull_n`` active gaussians, shrinking every
    N-proportional binning/gather stage to that length — the scaling
    lever for band sharding, where each band touches ~1/D of the
    scene's actives but otherwise replays full-N work. Identical
    output while the true active count fits (``cull_needed`` reports
    it; grow-and-re-jit on overflow like ``pairs``/``expand_needed``).

    Reference-scale N (pallas backend): when ``tile_bits +
    ceil(log2(N))`` exceeds 31 the binning automatically switches to
    wide (tile, rank) sort keys (see ``binning.bin_gaussians``), so
    multi-million-gaussian scenes render on the same fused path.
    ``force_wide`` pins that encoding at small N (tests / A-B timing).
    """
    n = params.capacity
    tile_h, tile_w = tile
    tiles_x = -(-camera.width // tile_w)
    tiles_y_total = -(-camera.height // tile_h)
    if band_rows is not None:
        tiles_y = band_rows
        row0 = (jnp.zeros((), jnp.int32) if band_row0 is None
                else jnp.asarray(band_row0, jnp.int32))
        out_h = band_rows * tile_h
    else:
        tiles_y = tiles_y_total
        row0 = None
        out_h = camera.height
    if pair_budget is None:
        pair_budget = 8 * n
    if backend == "pallas":
        # Segments are unaligned; the kernels DMA 128-aligned enclosing
        # windows, whose last chunk may read up to align128(total) — keep
        # the pair array a CHUNK multiple so that stays in bounds.
        c = pallas_composite.CHUNK
        pair_budget = -(-pair_budget // c) * c
        # XLA-TPU row gathers run 2.26x SLOWER when the gathered length
        # is a multiple of 1024 (measured: 10.55 vs 4.67 ns/row, exact
        # at the boundary; 128/256/512-multiples are fine). Training
        # budgets are multiples of a power-of-two capacity, so they
        # always hit it — bump one chunk past.
        if pair_budget % 1024 == 0:
            pair_budget += c

    proj = geometry.project_gaussians(
        params.xyz, params.features(), params.act_opacity()[:, 0],
        params.act_scaling(), params.act_rotation(), params.live,
        camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, camera.width, camera.height,
        sh_degree, scaling_modifier, means2d_offset)

    packed = (pallas_composite.pack_attrs(
        proj.means2d, proj.conic, proj.opacity, proj.color, proj.depth)
        if backend == "pallas" else None)

    bins = binning.bin_gaussians(
        jax.lax.stop_gradient(proj.means2d),
        jax.lax.stop_gradient(proj.radius),
        jax.lax.stop_gradient(proj.depth),
        tiles_x, tiles_y, tile_w, tile_h, pair_budget, max_per_tile,
        gather_ids=(backend == "xla"),
        aligned_chunk=(pallas_composite.CHUNK if backend == "pallas"
                       else 0),
        extent=jax.lax.stop_gradient(proj.extent),
        expand_kernel=(backend == "pallas"), interpret=interpret,
        expand_window=expand_window,
        tile_row0=row0, tiles_y_total=tiles_y_total,
        tile_row_stride=band_stride, cull_n=cull_n,
        force_wide=force_wide, wide_mode=wide_mode)

    if backend == "pallas":
        if (tile_h * tile_w) % 128 != 0:
            raise ValueError(
                "pallas backend needs tile_h*tile_w % 128 == 0 "
                "(16x16 and 8x16 are the tuned shapes)")
        if bins.rank_lo is not None and bins.order is not None:
            # bf16-split transport for BOTH latency-bound gathers (the
            # depth-rank permutation and the pair gather): f32 rows pay
            # a lane-padded 512 B transaction regardless of width, bf16
            # rows half that (measured 2.4x). pair_attrs_bf16 is one
            # custom-VJP unit with f32 semantics at both ends; its
            # backward reduces pair cotangents via the double-sort
            # segment reduction in f32.
            from .bf16_transport import pair_attrs_bf16
            attrs_t = pair_attrs_bf16(packed, bins.order,
                                      bins.gid_sorted, bins.rank_lo,
                                      bins.order_full)
        else:
            # Generic fallback (packed keys unavailable): gid_sorted is
            # in original id space; plain gather + autodiff.
            packed_s = jnp.concatenate(
                [packed, jnp.zeros((1, packed.shape[1]), packed.dtype)])
            attrs_t = packed_s[bins.gid_sorted].T
        row0_f = jnp.stack(
            [jnp.zeros((), jnp.float32) if row0 is None
             else row0.astype(jnp.float32),
             jnp.float32(band_stride)])
        tiles8 = _pallas_composite_diff(
            tiles_x, tiles_y, tile_h, tile_w, interpret, attrs_t,
            bins.seg_start.astype(jnp.float32),
            bins.counts.astype(jnp.float32), row0_f)
        # Background composite over the dense raw tiles (bg-free
        # accumulators + final T) — in XLA, where it is a fused
        # full-width pass and autodiff covers d_bg. rgb rides as three
        # PLANAR [T, PIX] channels through _assemble and is interleaved
        # at the very end: the interleaved [T, PIX, 3] path paid
        # ~0.6 ms/frame of layout copies at 1080p (xplane, PERF.md)
        # where each planar channel assembles in ~0.1 ms like depth.
        bgv = jnp.asarray(bg_color, jnp.float32)
        t_fin = tiles8[:, 4, :]                            # [T, PIX]
        tile_chan = [tiles8[:, c, :] + t_fin * bgv[c] for c in range(3)]
        tile_depth = tiles8[:, 3, :] + t_fin * composite.DEPTH_EMPTY
        tile_alpha = 1.0 - t_fin
        rgb = jnp.stack(
            [_assemble(ch, tiles_x, tiles_y, tile_w, tile_h,
                       camera.width, out_h)
             for ch in tile_chan], axis=-1)
        depth = _assemble(tile_depth, tiles_x, tiles_y, tile_w, tile_h,
                          camera.width, out_h)
        alpha = _assemble(tile_alpha, tiles_x, tiles_y, tile_w, tile_h,
                          camera.width, out_h)
        return RenderOutput(rgb=rgb, depth=depth, alpha=alpha,
                            radii=proj.radius,
                            visibility=proj.radius > 0,
                            pairs=bins.total_pairs,
                            pad_pairs=bins.pad_pairs,
                            expand_needed=bins.expand_needed,
                            cull_needed=bins.cull_needed)
    else:
        pix = _tile_pixel_coords(tiles_x, tiles_y, tile_w, tile_h)
        if row0 is not None:
            # Shift each local tile row ty to its global frame origin
            # (row0 + ty*stride)*tile_h (exact: integer-valued f32
            # < 2^24) so dx/dy bit-match the full-frame path.
            ty = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32) // tiles_x
            dy = (row0 + ty * (band_stride - 1)) * tile_h
            pix = pix + jnp.stack(
                [jnp.zeros_like(dy), dy], axis=-1)[:, None, :].astype(
                    jnp.float32)
        out = composite.composite_tiles(
            bins.ids, bins.valid, pix, proj.means2d, proj.conic,
            proj.color, proj.depth, proj.opacity,
            jnp.asarray(bg_color, jnp.float32), chunk=chunk)

    rgb = _assemble(out.rgb, tiles_x, tiles_y, tile_w, tile_h,
                    camera.width, out_h)
    depth = _assemble(out.depth, tiles_x, tiles_y, tile_w, tile_h,
                      camera.width, out_h)
    alpha = _assemble(out.alpha, tiles_x, tiles_y, tile_w, tile_h,
                      camera.width, out_h)
    return RenderOutput(rgb=rgb, depth=depth, alpha=alpha,
                        radii=proj.radius, visibility=proj.radius > 0,
                        pairs=bins.total_pairs, pad_pairs=bins.pad_pairs,
                        expand_needed=bins.expand_needed,
                        cull_needed=bins.cull_needed)


def render_views(params: GaussianParams, cameras, bg_color: jnp.ndarray,
                 **kwargs) -> RenderOutput:
    """Render several same-size views of one scene (orbit sequences,
    reference ``gen_seq.py``); returns RenderOutput with a leading view
    dim. One compiled step per pose, dispatched back to back (async
    dispatch keeps the device busy). A vmapped variant measured 2x
    SLOWER on v5e (58 vs 29 ms/view at 512x384/200k) — the batched
    [V, P] sort/gather lowerings lose more than the per-view dispatch
    saves — so the loop stands (see PERF.md)."""
    protos = [c if isinstance(c, RenderCamera)
              else RenderCamera.from_camera(c) for c in cameras]
    p0 = protos[0]
    statics = {(c.width, c.height, c.tan_fovx, c.tan_fovy)
               for c in protos}
    if len(statics) > 1:
        # Only world_view/full_proj/campos vary below: mixed sizes or
        # FOVs would silently render every non-first view with view 0's
        # focal/frustum. Callers with heterogeneous cameras must loop
        # plain render().
        raise ValueError(f"render_views needs uniform camera statics "
                         f"(width, height, tan_fovx, tan_fovy); got "
                         f"{sorted(statics)}")

    def one(w, f, c):
        cam = dataclasses.replace(p0, world_view=w, full_proj=f, campos=c)
        # render is itself jitted; identical static args reuse one
        # executable across the loop.
        return render(params, cam, bg_color, **kwargs)

    outs = [one(c.world_view, c.full_proj, c.campos) for c in protos]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)


def render_oracle(params: GaussianParams, camera: RenderCamera,
                  bg_color: jnp.ndarray, sh_degree: int = 0,
                  scaling_modifier: float = 1.0) -> RenderOutput:
    """Untiled O(H*W*N) golden-path renderer for tests."""
    proj = geometry.project_gaussians(
        params.xyz, params.features(), params.act_opacity()[:, 0],
        params.act_scaling(), params.act_rotation(), params.live,
        camera.world_view, camera.full_proj, camera.campos,
        camera.tan_fovx, camera.tan_fovy, camera.width, camera.height,
        sh_degree, scaling_modifier)
    # Cull by pushing invisible splats to the back with zero opacity.
    sort_depth = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    rgb, depth, alpha = composite.composite_dense(
        proj.means2d, proj.conic, proj.color, proj.depth, proj.opacity,
        order, camera.width, camera.height,
        jnp.asarray(bg_color, jnp.float32), radius=proj.radius,
        extent=proj.extent)
    return RenderOutput(rgb=rgb, depth=depth, alpha=alpha,
                        radii=proj.radius, visibility=proj.radius > 0)
