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
    gid_sorted: jnp.ndarray   # [P] int32 pair-sorted gaussian ids;
    # depth-RANK space when ``order`` is set (index into params[order])
    seg_start: jnp.ndarray    # [T] int32 segment starts into gid_sorted
    order: jnp.ndarray | None  # [N] depth argsort, or None (fallback)


def bin_gaussians(means2d: jnp.ndarray, radius: jnp.ndarray,
                  depth: jnp.ndarray, tiles_x: int, tiles_y: int,
                  tile_w: int, tile_h: int, pair_budget: int,
                  max_per_tile: int, gather_ids: bool = True,
                  aligned_chunk: int = 0) -> TileBins:
    """``aligned_chunk`` > 0 re-scatters the sorted pairs so every tile's
    segment starts at a chunk-aligned offset (Mosaic-provable DMA slices
    for the Pallas kernel); ``gid_sorted`` then has length
    pair_budget + num_tiles*aligned_chunk with sentinel id = N (callers
    pad the attribute table with one zero row)."""
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y

    # Fast path: pre-sort gaussians by depth once (N elements), so pair
    # order within a tile == gaussian index order, and the pair sort
    # collapses to ONE packed int32 key (tile << bits | depth_rank)
    # instead of a 3-operand lexicographic sort over the much larger P.
    gid_bits = max(1, (n - 1).bit_length())
    packed_ok = (num_tiles + 1) < (1 << (31 - gid_bits))
    if packed_ok:
        order = jnp.argsort(jnp.where(radius > 0, depth, jnp.inf))
        means2d = means2d[order]
        radius = radius[order]
        depth = depth[order]
    else:
        order = None

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

    # Pair slot j belongs to gaussian i = last index with starts[i] <= j.
    # TPU gathers over millions of slots are pathologically slow, so ALL
    # per-slot lookups of piecewise-constant per-gaussian values (gid,
    # starts, x0, y0, rect_w) telescope through ONE small scatter of
    # per-gaussian deltas at the segment starts + cumsums over the slot
    # axis (duplicate starts from count-0 gaussians accumulate their
    # deltas, which telescopes to the correct next value).
    slots = jnp.arange(pair_budget, dtype=jnp.int32)

    def d(v):
        return jnp.diff(jnp.concatenate([jnp.zeros((1,), v.dtype), v]))

    deltas = jnp.stack([jnp.ones((n,), jnp.int32), d(starts), d(x0),
                        d(y0), d(rect_w)], axis=1)  # [N, 5]
    carried = jnp.cumsum(
        jnp.zeros((pair_budget, 5), jnp.int32).at[starts].add(
            deltas, mode="drop"), axis=0)
    gid_c = jnp.clip(carried[:, 0] - 1, 0, n - 1)
    local = slots - carried[:, 1]
    w = jnp.maximum(carried[:, 4], 1)
    tx = carried[:, 2] + local % w
    ty = carried[:, 3] + local // w
    tile = ty * tiles_x + tx
    invalid = slots >= total
    tile = jnp.where(invalid, num_tiles, tile).astype(jnp.int32)

    if packed_ok:
        key = jnp.where(invalid, jnp.int32(2 ** 31 - 1),
                        (tile << gid_bits) | gid_c)
        key_s = jnp.sort(key)
        tile_s = jnp.where(key_s == 2 ** 31 - 1, num_tiles,
                           key_s >> gid_bits).astype(jnp.int32)
        # gid stays in depth-RANK space: callers index params[order].
        gid_s = jnp.where(key_s == 2 ** 31 - 1, n,
                          key_s & ((1 << gid_bits) - 1)).astype(jnp.int32)
    else:
        # Lexicographic (tile, depth) sort over all operands.
        sort_depth = jnp.where(invalid, jnp.inf, depth[gid_c])
        tile_s, gid_s = _lex_sort(tile, sort_depth, gid_c)

    # Per-tile segments.
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tile_range, side="left")
    seg_end = jnp.searchsorted(tile_s, tile_range, side="right")
    counts = (seg_end - seg_start).astype(jnp.int32)

    if gather_ids:
        k = jnp.arange(max_per_tile, dtype=jnp.int32)
        idx = jnp.clip(seg_start[:, None] + k[None, :], 0, pair_budget - 1)
        ids = gid_s[idx]
        if packed_ok:
            # XLA-path consumers index original-order arrays.
            ids = order[jnp.clip(ids, 0, n - 1)].astype(jnp.int32)
        valid = k[None, :] < jnp.minimum(counts, max_per_tile)[:, None]
    else:
        ids = jnp.zeros((0, 0), jnp.int32)
        valid = jnp.zeros((0, 0), bool)

    if aligned_chunk:
        # Chunk-aligned relayout WITHOUT a large scatter: the aligned
        # destination is monotone in j, so the inverse map "aligned slot
        # k -> source pair j" is k - offset(k) where offset changes only
        # at tile boundaries. A tiny scatter of per-tile deltas at the
        # aligned starts + one cumsum recovers offset(k); the payload
        # moves via a single gather (TPU scatters over millions of random
        # indices are pathologically slow; this is all vector work).
        c = aligned_chunk
        p_aligned = pair_budget + num_tiles * c
        seg_len_aligned = ((counts + c - 1) // c) * c
        start_aligned = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(seg_len_aligned)[:-1].astype(jnp.int32)])
        seg_start32 = seg_start.astype(jnp.int32)
        off = start_aligned - seg_start32                 # [T]
        delta = jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                          off]))
        offset_k = jnp.cumsum(
            jnp.zeros((p_aligned,), jnp.int32).at[start_aligned].add(
                delta, mode="drop"))
        k = jnp.arange(p_aligned, dtype=jnp.int32)
        src = k - offset_k
        # valid aligned slots: within the tile's true segment
        seg_end32 = seg_start32 + counts
        end_k = jnp.cumsum(
            jnp.zeros((p_aligned,), jnp.int32).at[start_aligned].add(
                jnp.diff(jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), seg_end32])),
                mode="drop"))
        in_seg = src < end_k
        gid_aligned = jnp.where(
            in_seg, gid_s[jnp.clip(src, 0, pair_budget - 1)], n)
        return TileBins(ids=ids, valid=valid, counts=counts,
                        total_pairs=total, gid_sorted=gid_aligned,
                        seg_start=start_aligned, order=order)

    return TileBins(ids=ids, valid=valid, counts=counts,
                    total_pairs=total, gid_sorted=gid_s,
                    seg_start=seg_start.astype(jnp.int32), order=order)


def _lex_sort(tile, depth, gid):
    import jax
    tile_s, _, gid_s = jax.lax.sort((tile, depth, gid), num_keys=2)
    return tile_s, gid_s
