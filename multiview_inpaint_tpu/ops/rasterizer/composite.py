"""Front-to-back alpha compositing of binned splats — the TPU way.

Key redesign vs the CUDA reference: per-pixel sequential blending becomes a
**vectorized exclusive-cumprod**. For a tile of P pixels and its K
depth-sorted splats, per-chunk of C splats:

    alpha[P, C]  = min(0.99, opacity * exp(-0.5 d^T conic d))
    T_in[P, C]   = carry_T * exclusive_cumprod(1 - alpha)   (log-cumsum)
    w[P, C]      = alpha * T_in * [T_out >= 1e-4]           (CUDA stop rule)
    rgb_acc     += w @ color[C, 3]                          (MXU matmul)
    carry_T     *= prod(1 - alpha)

A ``lax.scan`` over K/C chunks bounds memory at [P, C]; ``vmap`` over tiles
fills the chip. Fully differentiable by construction (no custom VJP needed
for correctness; the Pallas fused kernel is a later perf drop-in), with the
same skip/termination semantics as the reference kernel: alpha < 1/255
contributes nothing, blending stops once transmittance drops below 1e-4,
background is composited with the residual transmittance, and empty-pixel
depth is the 15.0 sentinel relied on by mask generation
(``gen_seq.py:50``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

DEPTH_EMPTY = 15.0  # far-background depth sentinel (reference contract)
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1e-4
# Per-splat alpha cutoff = the opacity-aware k-sigma ellipse the binning
# extents encode (k = min(3, sqrt(2 ln(255 op))), geometry.py): alpha >=
# max(1/255, op*e^{-4.5}). Gating per PIXEL on the exact ellipse (instead
# of on rect-tile membership) makes the composited image independent of
# the tile shape — required since the pallas path runs 8x16 tiles while
# the XLA path bins 16x16.
GATE_E = 0.011108996538242306  # e^{-4.5}


def alpha_gate(opacity):
    """[.., ] per-splat minimum contributing alpha (see GATE_E note)."""
    return jnp.maximum(ALPHA_MIN, opacity * jnp.float32(GATE_E))


class TileImage(NamedTuple):
    rgb: jnp.ndarray    # [T, P, 3]
    depth: jnp.ndarray  # [T, P]
    alpha: jnp.ndarray  # [T, P] accumulated opacity (1 - T_final)


def composite_tiles(ids: jnp.ndarray, valid: jnp.ndarray,
                    pix: jnp.ndarray, means2d: jnp.ndarray,
                    conic: jnp.ndarray, color: jnp.ndarray,
                    depth: jnp.ndarray, opacity: jnp.ndarray,
                    bg_color: jnp.ndarray, chunk: int = 64) -> TileImage:
    """Composite all tiles.

    Args:
      ids/valid: [T, K] from binning (depth-sorted per tile).
      pix: [T, P, 2] pixel-center coordinates of each tile's pixels.
      means2d/conic/color/depth/opacity: dense per-gaussian arrays.
      bg_color: [3].
      chunk: splats per scan step (C).
    """
    t_tiles, k_max = ids.shape
    n_chunks = -(-k_max // chunk)
    pad = n_chunks * chunk - k_max
    if pad:
        ids = jnp.pad(ids, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    ids_c = ids.reshape(t_tiles, n_chunks, chunk)
    valid_c = valid.reshape(t_tiles, n_chunks, chunk)

    def tile_body(tile_pix, tile_ids, tile_valid):
        # tile_pix [P,2]; tile_ids [n_chunks, chunk]
        def step(carry, xs):
            t_carry, rgb_acc, d_acc = carry
            g, ok = xs                      # [C], [C]
            mu = means2d[g]                 # [C,2]
            co = conic[g]                   # [C,3]
            col = color[g]                  # [C,3]
            dep = depth[g]                  # [C]
            op = opacity[g]                 # [C]
            d = tile_pix[:, None, :] - mu[None, :, :]   # [P,C,2]
            dx, dy = d[..., 0], d[..., 1]
            power = (-0.5 * (co[None, :, 0] * dx * dx
                             + co[None, :, 2] * dy * dy)
                     - co[None, :, 1] * dx * dy)
            alpha = jnp.minimum(0.99, op[None, :] * jnp.exp(power))
            alpha = jnp.where(
                (alpha >= alpha_gate(op)[None, :]) & ok[None, :]
                & (power <= 0), alpha, 0.0)
            # exclusive cumprod along C via cumsum in log space
            logs = jnp.log1p(-alpha)        # alpha <= 0.99 -> finite
            cum = jnp.cumsum(logs, axis=-1)
            t_out = t_carry[:, None] * jnp.exp(cum)      # after each splat
            t_in = t_carry[:, None] * jnp.exp(cum - logs)  # before each
            w = alpha * t_in
            # CUDA stop rule: a splat that would push T below 1e-4 is
            # skipped and blending ends.
            w = jnp.where(t_out >= T_STOP, w, 0.0)
            rgb_acc = rgb_acc + jnp.dot(w, col,
                                        preferred_element_type=jnp.float32)
            d_acc = d_acc + jnp.dot(w, dep,
                                    preferred_element_type=jnp.float32)
            # Carry transmittance over contributing splats only (they form
            # a prefix: t_out is monotone non-increasing along C).
            contrib = t_out >= T_STOP
            t_next = t_carry * jnp.exp(
                jnp.sum(jnp.where(contrib, logs, 0.0), axis=-1))
            return (t_next, rgb_acc, d_acc), None

        p = tile_pix.shape[0]
        init = (jnp.ones((p,), jnp.float32),
                jnp.zeros((p, 3), jnp.float32),
                jnp.zeros((p,), jnp.float32))
        (t_fin, rgb_acc, d_acc), _ = jax.lax.scan(
            step, init, (tile_ids, tile_valid))
        rgb = rgb_acc + t_fin[:, None] * bg_color[None, :]
        dep = d_acc + t_fin * DEPTH_EMPTY
        return rgb, dep, 1.0 - t_fin

    rgb, dep, acc = jax.vmap(tile_body)(pix, ids_c, valid_c)
    return TileImage(rgb=rgb, depth=dep, alpha=acc)


@partial(jax.jit, static_argnames=("width", "height", "tile"))
def composite_dense(means2d, conic, color, depth, opacity, order,
                    width: int, height: int, bg_color,
                    radius=None, tile: tuple[int, int] | None = (16, 16),
                    extent=None):
    """Reference oracle: every pixel against every gaussian, no tiling.

    ``order`` is the depth argsort of the gaussians (culled ones must sort
    last with opacity 0). When ``radius``/``tile`` are given, a splat only
    reaches pixels whose tile intersects its radius rectangle — the same
    spatial cutoff the tiled path (and the CUDA reference) applies;
    ``extent`` [N,2] switches to the tighter per-axis 3-sigma AABB the
    tiled path bins with. O(H*W*N) — tests only.
    """
    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(
        jnp.float32)
    mu = means2d[order]
    co = conic[order]
    col = color[order]
    dep = depth[order]
    op = opacity[order]
    d = pix[:, None, :] - mu[None, :, :]
    dx, dy = d[..., 0], d[..., 1]
    power = (-0.5 * (co[None, :, 0] * dx * dx + co[None, :, 2] * dy * dy)
             - co[None, :, 1] * dx * dy)
    alpha = jnp.minimum(0.99, op[None, :] * jnp.exp(power))
    alpha = jnp.where((alpha >= alpha_gate(op)[None, :]) & (power <= 0),
                      alpha, 0.0)
    del d
    if radius is not None and tile is not None:
        th, tw = tile
        if extent is not None:
            rx = extent[order, 0].astype(jnp.float32)
            ry = extent[order, 1].astype(jnp.float32)
        else:
            rx = ry = radius[order].astype(jnp.float32)
        px_tile = jnp.floor(pix[:, 0] / tw)
        py_tile = jnp.floor(pix[:, 1] / th)
        x0 = jnp.floor((mu[:, 0] - rx) / tw)
        x1 = jnp.floor((mu[:, 0] + rx) / tw) + 1
        y0 = jnp.floor((mu[:, 1] - ry) / th)
        y1 = jnp.floor((mu[:, 1] + ry) / th) + 1
        in_rect = ((px_tile[:, None] >= x0[None]) &
                   (px_tile[:, None] < x1[None]) &
                   (py_tile[:, None] >= y0[None]) &
                   (py_tile[:, None] < y1[None]))
        alpha = jnp.where(in_rect, alpha, 0.0)
    logs = jnp.log1p(-alpha)
    cum = jnp.cumsum(logs, axis=-1)
    t_out = jnp.exp(cum)
    t_in = jnp.exp(cum - logs)
    w = alpha * t_in
    w = jnp.where(t_out >= T_STOP, w, 0.0)
    # Final transmittance = product over contributing splats only.
    contrib = t_out >= T_STOP
    t_fin = jnp.exp(jnp.sum(jnp.where(contrib, logs, 0.0), axis=-1))
    rgb = w @ col + t_fin[:, None] * bg_color[None, :]
    dpt = w @ dep + t_fin * DEPTH_EMPTY
    return (rgb.reshape(height, width, 3), dpt.reshape(height, width),
            (1.0 - t_fin).reshape(height, width))
