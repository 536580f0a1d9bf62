"""Tile binning: gaussian->tile pair expansion + lexicographic sort.

Replaces the CUDA rasterizer's atomics/prefix-sum duplication + radix sort
with static-shape XLA primitives:

1. per-gaussian tile rectangles (same getRect math as the reference kernel),
2. exact pair expansion into a fixed budget P via exclusive-cumsum +
   searchsorted (each pair slot finds its gaussian by binary search — no
   scatter, no atomics),
3. ``lax.sort`` with num_keys=2 over (tile_id, depth) — XLA's on-chip sort
   replaces the CUDA radix sort over packed 64-bit keys,
4. per-tile segment [start, count) via searchsorted, then a dense [T, K]
   gather of gaussian ids (K = max splats composited per tile).

Everything is static-shaped; overflow beyond the pair budget or K is
reported so callers can grow buffers (doubling schedule) instead of
silently clipping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TileBins(NamedTuple):
    ids: jnp.ndarray        # [T, K] int32 gaussian indices, depth-sorted
    valid: jnp.ndarray      # [T, K] bool
    counts: jnp.ndarray     # [T] int32 (uncapped true per-tile counts)
    total_pairs: jnp.ndarray  # [] int32 (true total; > P means overflow)


def bin_gaussians(means2d: jnp.ndarray, radius: jnp.ndarray,
                  depth: jnp.ndarray, tiles_x: int, tiles_y: int,
                  tile_w: int, tile_h: int, pair_budget: int,
                  max_per_tile: int) -> TileBins:
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y

    r = radius.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_w), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_h), 0, tiles_y)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r + tile_w - 1) / tile_w),
                  0, tiles_x)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r + tile_h - 1) / tile_h),
                  0, tiles_y)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    rect_w = (x1 - x0).astype(jnp.int32)
    rect_h = (y1 - y0).astype(jnp.int32)
    count = jnp.where(radius > 0, rect_w * rect_h, 0)

    ends = jnp.cumsum(count)          # inclusive; [N]
    starts = ends - count
    total = ends[-1] if n > 0 else jnp.int32(0)

    # Pair slot j belongs to gaussian i = first index with ends[i] > j.
    slots = jnp.arange(pair_budget, dtype=jnp.int32)
    gid = jnp.searchsorted(ends, slots, side="right").astype(jnp.int32)
    gid_c = jnp.clip(gid, 0, n - 1)
    local = slots - starts[gid_c]
    w = jnp.maximum(rect_w[gid_c], 1)
    tx = x0[gid_c] + local % w
    ty = y0[gid_c] + local // w
    tile = ty * tiles_x + tx
    invalid = slots >= total
    tile = jnp.where(invalid, num_tiles, tile).astype(jnp.int32)

    # Lexicographic (tile, depth) sort; XLA sorts all operands together.
    sort_depth = jnp.where(invalid, jnp.inf, depth[gid_c])
    tile_s, gid_s = _lex_sort(tile, sort_depth, gid_c)

    # Per-tile segments.
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tile_range, side="left")
    seg_end = jnp.searchsorted(tile_s, tile_range, side="right")
    counts = (seg_end - seg_start).astype(jnp.int32)

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = jnp.clip(seg_start[:, None] + k[None, :], 0, pair_budget - 1)
    ids = gid_s[idx]
    valid = k[None, :] < jnp.minimum(counts, max_per_tile)[:, None]
    return TileBins(ids=ids, valid=valid, counts=counts,
                    total_pairs=total)


def _lex_sort(tile, depth, gid):
    import jax
    tile_s, _, gid_s = jax.lax.sort((tile, depth, gid), num_keys=2)
    return tile_s, gid_s
