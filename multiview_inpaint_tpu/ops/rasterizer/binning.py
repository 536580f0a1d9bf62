"""Tile binning: gaussian->tile pair expansion + lexicographic sort.

Replaces the CUDA rasterizer's atomics/prefix-sum duplication + radix sort
(reference ``submodules/diff-gaussian-rasterization`` forward: duplicate
WithKeys + cub radix sort + identifyTileRanges) with static-shape XLA
primitives designed around what is fast on TPU:

1. per-gaussian tile rectangles (same getRect math as the CUDA kernel),
2. exact pair expansion into a fixed budget P: every per-slot lookup of a
   piecewise-constant per-gaussian value telescopes through ONE small
   scatter of per-gaussian deltas at the segment starts + a cumsum over
   the slot axis (TPU gathers/scatters over millions of random indices
   are pathologically slow; cumsums and small scatters are not). The
   big prefix sums run as blocked triangular matmuls on the MXU
   (``_blocked_cumsum``) instead of XLA's log-pass cumsum.
3. ONE packed int32 key sort ``(tile << bits) | depth_rank`` (gaussians
   are pre-sorted by depth once, N elements, so within-tile pair order ==
   rank order),
4. per-tile segments:
   - XLA path: searchsorted -> dense [T, K] id gather;
   - Pallas path (``aligned_chunk`` > 0 + packed keys): segments stay
     **unaligned** — per-tile counts are known *without* the sort from an
     MXU coverage histogram (each rect is an outer product of an
     x-interval and a y-interval indicator, so the whole histogram is two
     matmuls), and seg_start is their exclusive cumsum. The compositing
     kernels DMA each segment from the 128-aligned enclosing window
     (``floor128(start)``, a Mosaic-provable offset) and mask the
     out-of-segment lanes, so NO alignment padding pairs exist: the sort,
     the P-row attribute gather, the transpose and the backward
     double-sort all run over true pairs only. (Round 1/2 injected
     sentinel pad pairs into the sort to make segments aligned by
     construction; at 1080p that was ~23% of all sorted/gathered slots.)

Everything is static-shaped; overflow beyond the pair budget or K is
reported so callers can grow buffers (doubling schedule) instead of
silently clipping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_INT_MAX = jnp.int32(2 ** 31 - 1)
# Rect-payload packing carries count in the low 16 bits of one sorted
# int32 payload; counts reach num_tiles, so grids at/above this limit
# take the permutation-gather fallback (tests monkeypatch this to force
# the fallback on small grids).
_RECT_PACK_TILE_LIMIT = 1 << 16


class TileBins(NamedTuple):
    ids: jnp.ndarray        # [T, K] int32 gaussian indices, depth-sorted
    valid: jnp.ndarray      # [T, K] bool
    counts: jnp.ndarray     # [T] int32 (uncapped true per-tile counts)
    total_pairs: jnp.ndarray  # [] int32 (true total; > P means overflow)
    gid_sorted: jnp.ndarray   # [P] int32 pair-sorted gaussian ids;
    # depth-RANK space when ``order`` is set (index into params[order])
    seg_start: jnp.ndarray    # [T] int32 segment starts into gid_sorted
    order: jnp.ndarray | None  # [N] depth argsort, or None (fallback)
    # alignment-padding count (generic fallback layout only; the packed
    # pallas path keeps segments unaligned and pays zero pads).
    pad_pairs: jnp.ndarray = 0
    # [N+2] int32 segment boundaries of each depth-rank row's pairs in
    # id-sorted pair order (aligned path only): feeds the double-sort
    # gradient reduction (segment_reduce.gather_pairs).
    rank_lo: jnp.ndarray | None = None
    # caller-supplied per-gaussian rows permuted into rank order (rides
    # the same single N-row gather as the rect table; differentiable).
    aux_sorted: jnp.ndarray | None = None
    # smallest valid expansion window for this frame (expand-kernel path
    # only): > the static ``expand_window`` means keys were corrupted
    # this frame and the caller must re-jit with a bigger window (the
    # kernel costs ~P*window/128 MXU cycles — keep it tight).
    expand_needed: jnp.ndarray = 0
    # true count of pair-emitting gaussians when ``cull_n`` is set
    # (0 otherwise): > cull_n means actives were dropped this frame and
    # the caller must re-jit with a bigger cull capacity (adaptive, like
    # pair_budget / expand_window growth).
    cull_needed: jnp.ndarray = 0
    # the UNtruncated [N] depth argsort when ``order`` is a cull prefix
    # (None otherwise): the gradient reduction maps rank-space segment
    # sums back to id space with one payload sort of this permutation
    # instead of a searchsorted (which lowers to a ~log2(M)-pass while
    # loop of [N]-row gathers — measured 252 ms/step at N=2M).
    order_full: jnp.ndarray | None = None


def _delta(v):
    return jnp.diff(jnp.concatenate([jnp.zeros((1,), v.dtype), v]))


def _expand_slots(starts, x0, y0, rect_w, total, n, tiles_x, num_tiles,
                  pair_budget):
    """XLA pair expansion via delta-scatter + blocked cumsum; returns
    per-slot (gid, tile, invalid)."""
    slots = jnp.arange(pair_budget, dtype=jnp.int32)
    deltas = jnp.stack([jnp.ones((n,), jnp.int32), _delta(starts),
                        _delta(x0), _delta(y0), _delta(rect_w)],
                       axis=1)  # [N, 5]
    carried = _blocked_cumsum(
        jnp.zeros((pair_budget, deltas.shape[1]), jnp.int32
                  ).at[starts].add(deltas, mode="drop"))
    gid_c = jnp.clip(carried[:, 0] - 1, 0, n - 1)
    local = slots - carried[:, 1]
    w = jnp.maximum(carried[:, 4], 1)
    tx = carried[:, 2] + local % w
    ty = carried[:, 3] + local // w
    tile = ty * tiles_x + tx
    invalid = slots >= total
    tile = jnp.where(invalid, num_tiles, tile).astype(jnp.int32)
    return gid_c, tile, invalid


def _blocked_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum over axis 0 of an int32 [P, C] array, computed
    as 128-row blocks x a triangular-ones matmul on the MXU plus a tiny
    block-offset cumsum. XLA's native cumsum lowers to log(P) shifted
    adds over the whole array (~21 passes at P~2M); this does one MXU
    pass (Precision.HIGHEST keeps f32-exact integer sums). Exact while
    every prefix value fits f32's 2^24 integer range — true for all
    binning channels (counts <= N, starts <= P, tile coords < 1024)."""
    import jax

    p, c = x.shape
    b = 128
    nb = -(-p // b)
    xf = jnp.pad(x, ((0, nb * b - p), (0, 0))).astype(jnp.float32)
    xf = xf.reshape(nb, b, c)
    rows = jnp.arange(b)
    tri = (rows[:, None] <= rows[None, :]).astype(jnp.float32)
    intra = jnp.einsum("nbc,bk->nkc", xf, tri,
                       precision=jax.lax.Precision.HIGHEST)
    totals = intra[:, -1, :]                       # [nb, C]
    offs = jnp.cumsum(totals, axis=0) - totals     # exclusive, tiny
    out = (intra + offs[:, None, :]).reshape(nb * b, c)
    return jnp.round(out[:p]).astype(jnp.int32)


def bin_gaussians(means2d: jnp.ndarray, radius: jnp.ndarray,
                  depth: jnp.ndarray, tiles_x: int, tiles_y: int,
                  tile_w: int, tile_h: int, pair_budget: int,
                  max_per_tile: int, gather_ids: bool = True,
                  aligned_chunk: int = 0,
                  extent: jnp.ndarray | None = None,
                  expand_kernel: bool = False,
                  interpret: bool = False,
                  aux: jnp.ndarray | None = None,
                  expand_window: int = 0,
                  tile_row0: jnp.ndarray | None = None,
                  tiles_y_total: int | None = None,
                  tile_row_stride: int = 1,
                  cull_n: int | None = None,
                  force_wide: bool = False,
                  wide_mode: str = "auto") -> TileBins:
    """``aligned_chunk`` > 0 selects the Pallas segment layout. With
    packed keys the layout is UNALIGNED (no padding pairs at all — the
    kernels DMA from the 128-aligned enclosing window and mask lanes);
    ``gid_sorted`` has length pair_budget with sentinel id = N past the
    true total (callers pad the attribute table with one zero row).
    The generic non-packed fallback still materializes an aligned
    relayout.

    Band mode (multi-chip single-frame sharding): ``tile_row0`` (traced
    int32 scalar) selects the ``tiles_y`` tile rows
    ``tile_row0 + l * tile_row_stride`` (l = 0..tiles_y-1) of a
    ``tiles_y_total``-row frame — a contiguous horizontal band at
    stride 1, or every D-th row at stride D (interleaved bands load-
    balance across devices: adjacent rows have similar splat loads).
    Rects are computed in GLOBAL tile coordinates and intersected with
    the row set in integer space, so a band's per-tile pair lists are
    exactly the full frame's (bit-identical compositing).

    ``cull_n`` (static, packed-key path only): cap the depth-rank
    compaction at the first ``cull_n`` ACTIVE (pair-emitting) gaussians
    and run every downstream N-proportional stage (rect permutation
    gather, cumsums, expansion table, coverage histogram — and, via the
    truncated ``order``, the caller's attribute gathers) at that length.
    The depth argsort already moves count>0 gaussians to a prefix, so
    when the frame's true active count fits, results are IDENTICAL to
    the unculled path; overflow is reported in ``cull_needed`` (the true
    active count) for grow-and-re-jit. The per-band N-culling lever for
    >8-chip band sharding (PERF.md): a stride-D band touches ~1/D of
    the scene's actives, but without culling every band replays the
    full-N gathers.

    Wide keys (reference-scale N): the packed ``tile << gid_bits |
    rank`` int32 key needs ``tile_bits + ceil(log2(N))`` <= 31 bits —
    at 1080p's 8160 tiles that caps N at 2^18 = 262k, while the
    reference's Mip-360 scenes run 1-6M gaussians
    (``gs-simp/scene/gaussian_model.py`` densification). When the bits
    don't fit (or ``force_wide`` is set, for tests/A-B), the pallas
    segment path keeps the SAME compaction/expansion/histogram
    pipeline but carries ``(tile, rank)`` as two int32 arrays and
    sorts them lexicographically (``lax.sort num_keys=2``) — exact
    same pair order, any N. ``pair_budget`` on the pallas segment
    layout is capped at ``pair_expand.MAX_PAIR_BUDGET`` (~16.7M, the
    bf16 slot-index sentinel); adaptive regrow loops clamp there."""
    n = means2d.shape[0]
    if cull_n is not None and int(cull_n) < 1:
        # nm = 0 would make order empty and every downstream clip
        # degenerate (max < min on an empty array) — fail loudly.
        raise ValueError(f"cull_n must be >= 1, got {cull_n}")
    num_tiles = tiles_x * tiles_y
    ty_clip = tiles_y if tiles_y_total is None else tiles_y_total

    # Per-axis half-extents (3-sigma ellipse AABB) when provided —
    # tighter rects than the CUDA reference's circumscribed circle.
    # Rects are computed BEFORE any permutation so the sort needs only
    # one packed [N, 4] gather afterwards (separate 1-D permutation
    # gathers serialize per element on TPU: ~0.66 ms each at N=100k).
    if extent is not None:
        rx = extent[:, 0].astype(jnp.float32)
        ry = extent[:, 1].astype(jnp.float32)
    else:
        rx = ry = radius.astype(jnp.float32)
    # Exclusive upper tile bound = floor(max_coord/tile) + 1, NOT the
    # CUDA getRect form floor((max_coord + tile - 1)/tile): for
    # non-integer max_coord in [m*tile, m*tile + 1) that form excludes
    # tile m even though it contains the last covered pixel
    # floor(max_coord). (Found by the 8x16-vs-16x16 tiling-invariance
    # test; the CUDA reference has the same sub-pixel clip.)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tile_w), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tile_h), 0, ty_clip)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + rx) / tile_w) + 1,
                  0, tiles_x)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + ry) / tile_h) + 1,
                  0, ty_clip)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    y1 = y1.astype(jnp.int32)
    if tile_row0 is not None:
        # Intersect the global rect rows with the band's row set
        # {row0 + l*stride}: local row l covers global y0 <= row0 +
        # l*stride < y1, so l in [ceil((y0-row0)/s), ceil((y1-row0)/s)).
        # Integer arithmetic — band-tile pair sets match the full frame
        # exactly. Downstream (keys, histogram) works in LOCAL rows.
        row0 = jnp.asarray(tile_row0, jnp.int32)
        s = int(tile_row_stride)
        if s == 1:
            y0 = jnp.clip(y0 - row0, 0, tiles_y)
            y1 = jnp.clip(y1 - row0, 0, tiles_y)
        else:
            # ceil((a)/s) for any-sign int a: -((-a) // s)
            y0 = jnp.clip(-((row0 - y0) // s), 0, tiles_y)
            y1 = jnp.clip(-((row0 - y1) // s), 0, tiles_y)
    rect_w = (x1 - x0).astype(jnp.int32)
    rect_h = (y1 - y0).astype(jnp.int32)
    count = jnp.where(radius > 0, rect_w * rect_h, 0)

    # Fast path: pre-sort gaussians by (live, depth) once (N elements):
    # pair order within a tile == gaussian index order, so the pair sort
    # collapses to ONE packed int32 key (tile << bits | depth_rank)
    # instead of a 3-operand lexicographic sort over the much larger P.
    # Keying on count>0 (not radius>0) also compacts covering gaussians
    # to the front, which the Pallas expansion kernel requires (strictly
    # increasing starts over the active prefix).
    nm = n if cull_n is None else min(int(cull_n), n)
    gid_bits = max(1, nm.bit_length())  # 2**bits > nm: room for sentinel
    packed_ok = ((num_tiles + 1) < (1 << (31 - gid_bits))
                 and not force_wide)
    # Wide (tile, rank) keys keep the fast rank path alive at any N on
    # the pallas segment layout; the dense-[T, K] XLA layout falls back
    # to the generic lexicographic path instead.
    wide = (not packed_ok) and aligned_chunk > 0
    use_rank = packed_ok or wide
    cull = nm < n
    if cull and (not use_rank or aux is not None):
        raise ValueError("cull_n needs the rank-compaction path (and no "
                         "aux rows): the cull IS the depth-rank "
                         "compaction")
    cull_needed = jnp.int32(0)
    order_full = None
    aux_sorted = None
    if use_rank:
        sort_key = jnp.where(count > 0, depth, jnp.inf)
        iota_n = jnp.arange(n, dtype=jnp.int32)
        # Static packing-bound guard (checked, not assumed): tile
        # coords and rect_w must fit 15 bits and count (<= num_tiles)
        # 16 bits, else the packed payloads silently corrupt (e.g. an
        # 8K frame at 16x16 tiles has 131k tiles and a full-frame
        # splat's count overflows the low half). Out-of-bounds frames
        # take the permutation-gather fallback below instead.
        pack_ok = (num_tiles < _RECT_PACK_TILE_LIMIT
                   and tiles_x < (1 << 15) and ty_clip < (1 << 15))
        if aux is None and pack_ok:
            # The rect table RIDES THE DEPTH ARGSORT as two packed
            # int32 payload operands instead of a separate N-row
            # permutation gather: the gather ran at the random-access
            # locality floor (9.3 ms at N=2M) plus bf16 encode/decode
            # fusions, while two extra sort payloads cost ~2 ms at the
            # measured sort rate. num_keys=2 (key, iota) keeps the
            # permutation stable == jnp.argsort.
            p1 = (x0 << 16) | y0
            p2 = (rect_w << 16) | count
            _, order, p1s, p2s = jax.lax.sort(
                (sort_key, iota_n, p1, p2), num_keys=2)
        else:
            order = jnp.argsort(sort_key)
        if cull_n is not None:
            # True active count BEFORE truncation: the overflow signal.
            # Computed whenever cull_n is set (even cull_n >= n, where
            # the truncation is a no-op) so probes can always read the
            # frame's active count — the sum is cheap.
            cull_needed = jnp.sum((count > 0).astype(jnp.int32))
        if cull:
            order_full = order  # the gradient reduction's rank->id map
            order = order[:nm]
        if aux is not None:
            # Legacy combined N-row gather for callers that still ride
            # attribute rows along the rect permutation (experiment
            # scripts). Int lanes ride as exact f32 VALUES (all < 2^24)
            # — NOT bitcasts: small int32 bit patterns are f32
            # denormals, and the TPU f32 copy path flushes denormals to
            # zero (hardware-measured). The aux lanes stay
            # differentiable via the inverse-permutation custom VJP.
            from .segment_reduce import permute_rows
            tab = jnp.stack([x0, y0, rect_w, count], axis=1)
            big = permute_rows(
                jnp.concatenate([tab.astype(jnp.float32), aux], axis=1),
                order)
            tab = jnp.round(big[:, :4]).astype(jnp.int32)
            aux_sorted = big[:, 4:]
            x0, y0, rect_w, count = (tab[:, 0], tab[:, 1], tab[:, 2],
                                     tab[:, 3])
        elif pack_ok:
            # Unpack the sorted payloads (see the sort above).
            if cull:
                p1s, p2s = p1s[:nm], p2s[:nm]
            x0 = p1s >> 16
            y0 = p1s & 0xFFFF
            rect_w = p2s >> 16
            count = p2s & 0xFFFF
        else:
            # Packing-bound fallback (huge tile grids): one packed
            # [N, 4] permutation gather of the rect table. All lanes
            # are exact f32 values (< 2^24: tile coords < 2^15 by the
            # projection clip, count <= num_tiles < 2^24 at any
            # realistic resolution).
            from .segment_reduce import permute_rows
            tab = jnp.stack([x0, y0, rect_w, count],
                            axis=1).astype(jnp.float32)
            tab = jnp.round(permute_rows(tab, order)).astype(jnp.int32)
            x0, y0, rect_w, count = (tab[:, 0], tab[:, 1], tab[:, 2],
                                     tab[:, 3])
        active = count > 0
    else:
        order = None
        active = count > 0

    ends = jnp.cumsum(count)          # inclusive; [NM]
    starts = ends - count
    total = ends[-1] if nm > 0 else jnp.int32(0)

    if expand_kernel and use_rank:
        # Pallas expansion: per-slot packed keys via windowed indicator
        # matmuls — the delta-scatter below serializes per row on TPU
        # (4.4 ms at 1080p) while the kernel streams (see
        # pair_expand.py). The compaction the kernel needs is already
        # folded into ``order`` above.
        from .pair_expand import expand_keys

        key, expand_needed = expand_keys(
            starts.astype(jnp.int32), x0, y0, rect_w, active, total, nm,
            gid_bits, tiles_x, pair_budget, window=expand_window,
            interpret=interpret, wide=wide)
    else:
        # Pair slot j belongs to gaussian i = last index with
        # starts[i] <= j. ONE small scatter of per-gaussian deltas at the
        # segment starts + cumsums over the slot axis reconstructs every
        # per-slot value (duplicate starts from count-0 gaussians
        # accumulate their deltas, which telescopes correctly).
        expand_needed = jnp.int32(0)
        gid_c, tile, invalid = _expand_slots(
            starts, x0, y0, rect_w, total, nm, tiles_x, num_tiles,
            pair_budget)
        if packed_ok:
            key = jnp.where(invalid, _INT_MAX, (tile << gid_bits) | gid_c)
        elif wide:
            key = (jnp.where(invalid, _INT_MAX, tile),
                   jnp.where(invalid, _INT_MAX, gid_c))
        else:
            key = None

    if aligned_chunk and use_rank:
        return _seg_bins(key, active, x0, y0, rect_w, starts, ends,
                         total, nm, gid_bits, tiles_x, tiles_y,
                         num_tiles, pair_budget, order,
                         wide_mode=wide_mode)._replace(aux_sorted=aux_sorted,
                                         expand_needed=expand_needed,
                                         cull_needed=cull_needed,
                                         order_full=order_full)

    if packed_ok:
        key_s = jnp.sort(key)
        tile_s = jnp.where(key_s == _INT_MAX, num_tiles,
                           key_s >> gid_bits).astype(jnp.int32)
        # gid stays in depth-RANK space: callers index params[order].
        gid_s = jnp.where(key_s == _INT_MAX, nm,
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
            ids = order[jnp.clip(ids, 0, nm - 1)].astype(jnp.int32)
        valid = k[None, :] < jnp.minimum(counts, max_per_tile)[:, None]
    else:
        ids = jnp.zeros((0, 0), jnp.int32)
        valid = jnp.zeros((0, 0), bool)

    if aligned_chunk:
        # Generic (non-packed-key) fallback: chunk-aligned relayout via
        # the monotone inverse map "aligned slot k -> source pair j".
        c = aligned_chunk
        p_aligned = pair_budget + num_tiles * c
        seg_len_aligned = ((counts + c - 1) // c) * c
        start_aligned = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(seg_len_aligned)[:-1].astype(jnp.int32)])
        seg_start32 = seg_start.astype(jnp.int32)
        off = start_aligned - seg_start32                 # [T]
        offset_k = jnp.cumsum(
            jnp.zeros((p_aligned,), jnp.int32).at[start_aligned].add(
                _delta(off), mode="drop"))
        k = jnp.arange(p_aligned, dtype=jnp.int32)
        src = k - offset_k
        seg_end32 = seg_start32 + counts
        end_k = jnp.cumsum(
            jnp.zeros((p_aligned,), jnp.int32).at[start_aligned].add(
                _delta(seg_end32), mode="drop"))
        in_seg = src < end_k
        gid_aligned = jnp.where(
            in_seg, gid_s[jnp.clip(src, 0, pair_budget - 1)], n)
        return TileBins(ids=ids, valid=valid, counts=counts,
                        total_pairs=total, gid_sorted=gid_aligned,
                        seg_start=start_aligned, order=order)

    return TileBins(ids=ids, valid=valid, counts=counts,
                    total_pairs=total, gid_sorted=gid_s,
                    seg_start=seg_start.astype(jnp.int32), order=order,
                    aux_sorted=aux_sorted, cull_needed=cull_needed)


def _seg_bins(key, active, x0, y0, rect_w, starts, ends, total, n,
              gid_bits, tiles_x, tiles_y, num_tiles, pair_budget, order,
              wide_mode="auto"):
    """Unaligned per-tile segments for the Pallas kernels (see module
    docstring): no padding pairs — the sort, gather and backward
    reduction run over true pairs only; the kernels window-align their
    DMA and mask lanes.

    Per-tile counts come from an exact coverage histogram computed on the
    MXU: a gaussian emits pairs for its rect rows in row-major order, so
    the emitted (budget-clamped) coverage of gaussian i is
    ``outer(rows y0..y0+q-1, cols x0..x0+w-1) + outer(row y0+q,
    cols x0..x0+rem-1)`` with ``q, rem = divmod(emitted_i, w)`` — two
    rank-1 terms, so the histogram over all gaussians is two matmuls
    (exact in f32: counts < 2^24)."""
    emit = (jnp.minimum(ends, pair_budget)
            - jnp.minimum(starts, pair_budget))          # [N] clamped
    emit = jnp.where(active, emit, 0)
    w = jnp.maximum(rect_w, 1)
    q = emit // w
    rem = emit - q * w

    def _cov_hist(x0b, y0b, wb, qb, remb):
        ty = jnp.arange(tiles_y, dtype=jnp.int32)[None, :]   # [1, TY]
        tx = jnp.arange(tiles_x, dtype=jnp.int32)[None, :]   # [1, TX]
        y0c = y0b[:, None]
        x0c = x0b[:, None]
        # bf16 indicators are exact (0/1); f32 accumulation keeps the
        # sums exact (< 2^24) and halves the operand traffic vs f32.
        uf = ((ty >= y0c) & (ty < y0c + qb[:, None])).astype(
            jnp.bfloat16)
        vf = ((tx >= x0c) & (tx < x0c + wb[:, None])).astype(
            jnp.bfloat16)
        up = ((ty == y0c + qb[:, None]) & (remb[:, None] > 0)).astype(
            jnp.bfloat16)
        vp = ((tx >= x0c) & (tx < x0c + remb[:, None])).astype(
            jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dot(uf, vf) + dot(up, vp)                  # [TY, TX]

    # At reference-scale N the [N, TY]/[N, TX] indicator operands are
    # gigabytes; accumulate the (exact) histogram over fixed N-chunks.
    NCHUNK = 1 << 19
    if n <= NCHUNK:
        hist = _cov_hist(x0, y0, w, q, rem)
    else:
        npad = -(-n // NCHUNK) * NCHUNK
        pad1 = lambda a: jnp.pad(  # noqa: E731
            a, (0, npad - n)).reshape(-1, NCHUNK)
        # padded rows carry q = rem = 0 -> all-zero indicator rows.
        hist = jax.lax.scan(
            lambda acc, xs: (acc + _cov_hist(*xs), None),
            jnp.zeros((tiles_y, tiles_x), jnp.float32),
            (pad1(x0), pad1(y0), pad1(w), pad1(q), pad1(rem)))[0]
    counts = jnp.round(hist).astype(jnp.int32).reshape(num_tiles)

    seg_start = (jnp.cumsum(counts) - counts).astype(jnp.int32)

    if isinstance(key, tuple):
        # Wide keys: (tile, rank) over the pair slots — any N. Within a
        # tile ranks are unique, so the order is exactly the packed
        # sort's. Invalid slots carry (INT_MAX, INT_MAX) and sort to
        # the end. Three encodings, narrowest first (sort cost on TPU
        # is operand-traffic-bound; PERF.md round 5):
        #   u32  — tile and rank fused into ONE unsigned key when
        #          (num_tiles + 1) < 2**(32 - gid_bits): one operand
        #          instead of two (covers 512x384 up to ~2M ranks and
        #          1080p up to ~524k — exactly the train-at-scale
        #          regime the i32 packed path misses by one bit).
        #   i16  — tile rides a 16-bit key operand when
        #          num_tiles < 2**15 - 1 (any realistic grid): 6 sort
        #          bytes/slot instead of 8.
        #   lex  — the original 2x int32 lexicographic fallback.
        tile_k, rank_k = key
        mode = wide_mode
        if mode == "auto":
            if (num_tiles + 1) < (1 << max(32 - gid_bits, 0)):
                mode = "u32"
            elif num_tiles < (1 << 15) - 1:
                mode = "i16"
            else:
                mode = "lex"
        if mode == "u32":
            # Valid keys < (num_tiles << gid_bits) + 2**gid_bits
            # <= 2**32 - 2**gid_bits - 1 < the 0xFFFFFFFF sentinel.
            ku = ((tile_k.astype(jnp.uint32) << gid_bits)
                  | rank_k.astype(jnp.uint32))
            ku = jnp.where(tile_k == _INT_MAX,
                           jnp.uint32(0xFFFFFFFF), ku)
            (ks,) = jax.lax.sort((ku,), is_stable=False)
            rank_s = (ks & jnp.uint32((1 << gid_bits) - 1)).astype(
                jnp.int32)
            gid_s = jnp.where(ks == jnp.uint32(0xFFFFFFFF), n,
                              jnp.minimum(rank_s, n)).astype(jnp.int32)
        elif mode == "i16":
            t16 = jnp.where(tile_k == _INT_MAX, (1 << 15) - 1,
                            tile_k).astype(jnp.int16)
            t16_s, rank_s = jax.lax.sort((t16, rank_k), num_keys=2)
            gid_s = jnp.where(rank_s == _INT_MAX, n,
                              jnp.minimum(rank_s, n)).astype(jnp.int32)
        else:
            tile_s, rank_s = jax.lax.sort((tile_k, rank_k), num_keys=2)
            gid_s = jnp.where(tile_s == _INT_MAX, n,
                              jnp.minimum(rank_s, n)).astype(jnp.int32)
    else:
        # Unstable single-operand sort: jnp.sort is stable by default,
        # which makes XLA carry an iota payload through every pass.
        # Equal keys are interchangeable here (the key IS the payload).
        (key_s,) = jax.lax.sort((key,), is_stable=False)
        mask = jnp.int32((1 << gid_bits) - 1)
        gid_s = jnp.minimum(key_s & mask, n).astype(jnp.int32)
        gid_s = jnp.where(key_s == _INT_MAX, n, gid_s)

    rank_lo = jnp.concatenate([
        jnp.minimum(starts, pair_budget).astype(jnp.int32),
        jnp.minimum(total, pair_budget).reshape(1).astype(jnp.int32),
        jnp.full((1,), pair_budget, jnp.int32),
    ])

    return TileBins(ids=jnp.zeros((0, 0), jnp.int32),
                    valid=jnp.zeros((0, 0), bool), counts=counts,
                    total_pairs=total, gid_sorted=gid_s,
                    seg_start=seg_start, order=order,
                    pad_pairs=jnp.int32(0), rank_lo=rank_lo)


def _lex_sort(tile, depth, gid):
    import jax
    tile_s, _, gid_s = jax.lax.sort((tile, depth, gid), num_keys=2)
    return tile_s, gid_s
