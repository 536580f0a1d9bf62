"""Pallas pair-expansion kernel: per-slot sort keys without scatters.

The XLA telescoping in ``binning.bin_gaussians`` reconstructs per-slot
values with ONE scatter of per-gaussian deltas + a blocked cumsum — but
TPU scatter serializes per update row (profiled 4.4 ms for 100k rows at
1080p/1.3M slots). This kernel removes the scatter entirely by
exploiting that the per-gaussian ``starts`` offsets are sorted:

For a block of B consecutive pair slots, every covering gaussian lies in
a contiguous index window [g0, g0+K) of the *compacted* (count>0, depth-
rank-ordered) gaussian table, because starts are strictly increasing.
Each per-slot value then telescopes as a tiny MXU matmul

    V(j) = V[g0-1] + sum_i  Delta_i * [starts_i <= j],    i in window

i.e. an indicator matrix [K, B] (VPU compares) against the delta table
[K, C] (one dot), plus a per-block baseline. The kernel emits the final
packed sort key ``tile * 2^gid_bits + compact_rank`` per slot directly.

Cost shaping (measured on v5e; a naive f32 variant was a 4.5 ms
regression, a B=128 3-matmul variant still 5 ms):
  - The table rows are 128 lanes wide (Mosaic DMA minimum) but only ~9
    channels are live, so exact-integer precision splits are free
    lane-wise: the hi/lo bf16 split terms of each delta channel ride
    SEPARATE LANES of ONE bf16 matmul per block, summed from the
    output rows afterwards.
  - The per-slot tail math (division into tile coords, key packing)
    runs once per GROUP of 8 blocks on [8, B] arrays — per-block [1, B]
    rows would use 1/8 of the VPU's sublanes.
  - The table is bf16 (exactness notes below), halving HBM traffic;
    ``starts`` rides three bf16 lanes (hi/mid/lo) that reconstruct the
    exact f32 value for the indicator compare.
  - Per-block baselines stream as a pipelined VMEM operand rather than
    SMEM scalars, so the tail math stays vectorized.

Exactness: every dotted lane is an integer-valued delta small enough
for an exact bf16 split into 8-bit chunks (see ``_bf16_mask_split`` —
the chunks MUST be built with integer masks, not f32 remainders, or
XLA-TPU excess precision folds the split to identity): d_starts =
per-gaussian pair count <= num_tiles < 2^16 (2 chunks), d_x0/d_y0/d_w
are tile coords < 257 (1 lane each). ``starts`` values themselves
(< pair_budget <= 0xFF0000) are never dotted, only compared, and 3
8-bit chunks reconstruct the exact f32 value. Accumulation is f32
(`preferred_element_type`).

Replaces: the reference CUDA ``duplicateWithKeys``
(diff-gaussian-rasterization forward), reimagined for the TPU: no
atomics, no per-gaussian append — every slot computes its own key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256          # pair slots per block
K = B + 32       # WORST-CASE gaussian window per block: <= B starts
                 # inside a block, +16 window alignment (bf16 sublane
                 # tile), + margin; multiple of 16. The kernel's cost is
                 # ~P*K/128 MXU cycles (profiled: the [K,128]@[K,B]
                 # indicator matmul is the whole 3.1 ms at 1080p), so
                 # callers pass a TIGHT ``window`` and grow on the
                 # returned overflow signal (adaptive, like the pair
                 # budget): scenes with fat rects need far fewer than
                 # B starts per block.
GROUP = 8        # blocks per grid step (amortizes per-step overhead)
# Largest pair_budget the pallas expansion supports: the block-padded
# slot count must stay below the bf16 sentinel BIG (slot indices ride
# bf16 mask-split channels). Callers' adaptive budget regrows clamp to
# this (~16.7M pairs, i.e. ~6-7M gaussians at the measured ~2.3
# pairs/gaussian); past it, widen the sentinel split or use the xla
# backend.
MAX_PAIR_BUDGET = 0xFF0000 - GROUP * B
BIG = 0xFF0000   # sentinel start: beyond any slot index; 8 significant
                 # bits -> exactly bf16-representable (hi-chunk aligned)
INT_MAX = 2 ** 31 - 1  # python int: jnp constants would be captured consts

# Lane map of the bf16 table (within 128-lane rows). The DOTTED
# channels sit in lanes 0-7 so phase 1 stores only the [0:8] sublane
# slice of each block's [128, B] matmul; the starts compare operand
# (never dotted) rides lanes 8-10.
_L_DS_HI, _L_DS_LO, _L_DX, _L_DY, _L_DW, _L_DC = 0, 1, 2, 3, 4, 5
_L_S0, _L_S1, _L_S2 = 8, 9, 10
# Baseline channels (lanes of the base operand): 1 starts, 2 x0, 3 y0,
# 4 w, 5 count — matching the delta channel semantics.


def _kernel(gid_bits, tiles_x, window, wide, g0r_ref, total_ref,
            table_ref, base_ref, *refs):
    if wide:
        # Wide key mode: (tile, rank) ride as TWO int32 outputs — the
        # packed ``tile << gid_bits | rank`` encoding runs out of int32
        # bits past n = 2^(31 - tile_bits) gaussians (262k at 1080p's
        # 8160 tiles); reference-scale scenes are 1-6M. The caller
        # sorts the pair lexicographically (lax.sort num_keys=2).
        tile_ref, rank_ref, vals_s, scratch, sems = refs
        out_ref = None
    else:
        out_ref, vals_s, scratch, sems = refs
        tile_ref = rank_ref = None
    step = pl.program_id(0)
    total = total_ref[0]
    nblk = pl.num_programs(0) * GROUP

    # Window DMAs are slotted on GLOBAL block index mod 4 and issued
    # TWO blocks ahead, across grid-step boundaries. The previous
    # scheme (2 slots, issue-1-ahead, cold DMA at the top of every
    # step) exposed the window DMA latency once per step — ~0.5 ms
    # across the 635 steps at 1080p — on a kernel whose per-block
    # compute (~0.3 us of MXU) is shorter than the DMA round trip.
    def get_dma(blk):
        g0 = pl.multiple_of(g0r_ref[blk], 16)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(g0, window), :], scratch.at[blk % 4],
            sems.at[blk % 4])

    @pl.when(step == 0)
    def _():
        get_dma(0).start()
        get_dma(1).start()

    # Phase 1: one matmul per block -> raw channel sums [128, B].
    def one_block(g, _):
        blk = step * GROUP + g

        @pl.when(blk + 2 < nblk)
        def _():
            get_dma(blk + 2).start()

        get_dma(blk).wait()
        tab = scratch[blk % 4]                     # [K, 128] bf16

        # exact f32 starts from the 3-lane bf16 split
        s = (tab[:, _L_S0:_L_S0 + 1].astype(jnp.float32)
             + tab[:, _L_S1:_L_S1 + 1].astype(jnp.float32)
             + tab[:, _L_S2:_L_S2 + 1].astype(jnp.float32))   # [K, 1]
        j = (blk * B + jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
             ).astype(jnp.float32)                 # [1, B]
        ind = (s <= j).astype(jnp.bfloat16)        # [K, B]
        # ONE bf16 matmul: [128, B] = table^T @ indicator; hi/lo split
        # terms live in separate lanes and are summed from output rows.
        # Only the 8 dotted-channel rows are stored.
        vals_s[g] = jax.lax.dot_general(
            tab, ind, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0:8, :]
        return 0

    jax.lax.fori_loop(0, GROUP, one_block, 0)

    # Phase 2: per-slot tail math for all GROUP blocks at once, [GROUP,B]
    # (blocks ride sublanes, slots ride lanes).
    base = base_ref[:, :]                              # [GROUP, 128] f32

    def ch(lane):
        return vals_s[:, lane, :]                      # [GROUP, B]

    starts = (ch(_L_DS_HI) + ch(_L_DS_LO) + base[:, 1:2])
    x0 = ch(_L_DX) + base[:, 2:3]
    y0 = ch(_L_DY) + base[:, 3:4]
    w = jnp.maximum(ch(_L_DW) + base[:, 4:5], 1.0)
    rank = ch(_L_DC) + base[:, 5:6] - 1.0

    j = (step * GROUP * B
         + jax.lax.broadcasted_iota(jnp.int32, (GROUP, B), 0) * B
         + jax.lax.broadcasted_iota(jnp.int32, (GROUP, B), 1)
         ).astype(jnp.float32)

    local = j - starts
    q = jnp.floor(local / w)
    r = local - q * w
    # exact-integer division correction (f32 quotient can be off by one
    # ulp at exact multiples)
    q = jnp.where(r < 0.0, q - 1.0, q)
    r = jnp.where(r < 0.0, r + w, r)
    q = jnp.where(r >= w, q + 1.0, q)
    r = jnp.where(r >= w, r - w, r)
    tile = (y0 + q) * float(tiles_x) + (x0 + r)

    invalid = j.astype(jnp.int32) >= total
    if wide:
        # f32-exact while tile < num_tiles <= 2^24 and rank < n <= 2^24
        # (n is further capped by the pair-budget sentinel BIG anyway).
        tile_ref[:, :] = jnp.where(invalid, jnp.int32(INT_MAX),
                                   tile.astype(jnp.int32))
        rank_ref[:, :] = jnp.where(invalid, jnp.int32(INT_MAX),
                                   rank.astype(jnp.int32))
    else:
        key = ((tile.astype(jnp.int32) << gid_bits)
               | rank.astype(jnp.int32))
        out_ref[:, :] = jnp.where(invalid, jnp.int32(INT_MAX), key)


def _bf16_mask_split(x_i32, masks):
    """Exact multi-term bf16 split of NONNEGATIVE int32 via 8-bit chunks.

    Each masked chunk carries <= 8 significant bits, so its f32 value is
    exactly bf16-representable and the terms sum back to x exactly.

    Why integer masks and not ``x - bf16(x)`` remainders: XLA-TPU runs
    with excess precision allowed and folds the f32->bf16->f32
    round-trip inside the remainder into identity, so the remainder
    lanes lower to all-zeros and the only rounding left happens at the
    bf16 table store.  On hardware this silently truncated ``starts`` to
    bf16 (267 -> 268, 281 -> 280, ...), flipping the ``s <= j``
    indicator at every non-representable integer and corrupting ~60% of
    sort keys at 1080p, while CPU/interpret (which honors the
    round-trip) matched the oracle bit-exactly.  Integer bitwise-ands
    cannot be folded by that pass.
    """
    return tuple((x_i32 & m).astype(jnp.float32).astype(jnp.bfloat16)
                 for m in masks)


@partial(jax.jit, static_argnames=("n", "gid_bits", "tiles_x",
                                   "pair_budget", "window", "interpret",
                                   "wide"))
def expand_keys(starts_c: jnp.ndarray, x0_c: jnp.ndarray,
                y0_c: jnp.ndarray, w_c: jnp.ndarray, active_c: jnp.ndarray,
                total: jnp.ndarray, n: int, gid_bits: int, tiles_x: int,
                pair_budget: int, window: int = 0,
                interpret: bool = False, wide: bool = False):
    """[P]-slot packed sort keys from compacted per-gaussian rects.

    Args (all [N], compacted: active (count>0) gaussians first, in depth
    rank order; ``starts_c`` strictly increasing over actives):
      starts_c: first pair slot per gaussian (int32).
      x0_c/y0_c: rect origin in tiles; w_c: rect width in tiles.
      active_c: bool, count>0 rows.
      total: [] int32 true total pair count (slots past it -> INT_MAX).
      window: per-block gaussian window size (static; 0 -> the
        always-correct worst case ``K``). The kernel costs ~P*window/128
        MXU cycles, so tight windows matter; when the scene needs more
        than ``window`` rows for some block, that block's keys are wrong
        — the returned ``needed`` tells the caller to re-jit bigger
        (adaptive, like pair-budget growth).
    Returns ``(keys [pair_budget] int32 (compact-rank id space),
    needed [] int32)`` where ``needed`` is the smallest valid ``window``
    for this frame's data. With ``wide=True`` (reference-scale scenes
    where ``tile << gid_bits | rank`` overflows int32) ``keys`` is the
    pair ``(tile [pair_budget] int32, rank [pair_budget] int32)``
    instead, to be sorted lexicographically.
    """
    window = window or K
    assert window % 16 == 0, "window must be a bf16-sublane multiple"
    nb = -(-pair_budget // B)
    nb_pad = -(-nb // GROUP) * GROUP
    p_pad = nb_pad * B
    assert p_pad <= BIG, "slot indices must stay below the bf16 sentinel"

    starts_i = jnp.where(active_c, starts_c, jnp.int32(BIG))
    s_hi, s_mid, s_lo = _bf16_mask_split(
        starts_i, (0xFF0000, 0x00FF00, 0x0000FF))

    def delta(v):
        vf = jnp.where(active_c, v.astype(jnp.float32), 0.0)
        return jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                         vf]))

    # delta(starts) over actives = per-gaussian pair counts (nonneg,
    # < 2^16); the negative active->inactive boundary delta never fires
    # (inactive rows compare at BIG), so zero it for mask exactness.
    ds_i = jnp.diff(jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.where(active_c, starts_c, 0)]))
    ds_i = jnp.where(active_c, ds_i, 0)
    ds_hi, ds_lo = _bf16_mask_split(ds_i, (0xFF00, 0x00FF))
    zero = jnp.zeros_like(s_hi)
    chans = jnp.stack([
        ds_hi, ds_lo,
        delta(x0_c).astype(jnp.bfloat16),
        delta(y0_c).astype(jnp.bfloat16),
        delta(w_c).astype(jnp.bfloat16),
        active_c.astype(jnp.bfloat16),
        zero, zero,
        s_hi, s_mid, s_lo,
    ], axis=1)                                        # [N, 11]
    rows = -(-(n + window) // 16) * 16
    # Build by pad, not .at[].set: the full-table dynamic-update-slice
    # wrote every lane of every row (5.3 ms at N=2M); the pad fuses
    # into one pass and only the <= window+16 sentinel tail rows need
    # a (tiny) update. Pad rows must compare at BIG (never fire).
    table = jnp.pad(chans, ((0, rows - n), (0, 128 - chans.shape[1])))
    if rows > n:
        table = table.at[n:, _L_S0].set(jnp.bfloat16(BIG))

    # Per-block first-gaussian window origin (16-aligned: bf16 sublane
    # tile): g_first[b] = #{active g : start_g <= b*B} - 1. Computed as
    # an MXU histogram + cumsum over block bins — searchsorted was the
    # binning stage's single hottest XLA op on hardware (the
    # method="sort" lowering merges starts+queries into one 105k sort
    # and recovers query ranks through a serializing scatter chain,
    # ~0.77 ms at 1080p; the default binary-search lowering is a
    # 17-pass while loop that cost ~2.4 ms at 10k blocks). start_g <=
    # b*B <=> ceil(start_g/B) <= b, so bin c_g = ceil(start_g/B),
    # factorized rank-1 as (c//64, c%64): the bin histogram is ONE
    # bf16 0/1-operand matmul (exact; f32 accumulation, counts < 2^24)
    # + a cumsum, exactly the coverage-histogram trick binning._seg_bins
    # uses for tile counts.
    block_starts = jnp.arange(nb_pad, dtype=jnp.int32) * B
    c_bin = jnp.where(active_c, -(-starts_c // B), INT_MAX)
    c_bin = jnp.minimum(c_bin, nb_pad)        # nb_pad = discard bin
    hi_bins = -(-(nb_pad + 1) // 64)

    def _hist_block(cb):
        c_hi = (cb // 64)[:, None]
        c_lo = (cb % 64)[:, None]
        u = (c_hi == jnp.arange(hi_bins, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)            # [nk, HI]
        v = (c_lo == jnp.arange(64, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)            # [nk, 64]
        return jax.lax.dot_general(
            u, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [HI, 64]

    # The indicator operands are [N, HI] — at reference scale (N in the
    # millions, HI in the hundreds) a single-shot build materializes
    # gigabytes, so big N accumulates the (exact: 0/1 bf16 products,
    # f32 sums < 2^24) histogram over fixed N-chunks instead.
    NCHUNK = 1 << 19
    if n <= NCHUNK:
        hist = _hist_block(c_bin)
    else:
        npad_h = -(-n // NCHUNK) * NCHUNK
        cb_all = jnp.pad(c_bin, (0, npad_h - n),
                         constant_values=nb_pad)   # pads -> discard bin
        hist = jax.lax.scan(
            lambda acc, cb: (acc + _hist_block(cb), None),
            jnp.zeros((hi_bins, 64), jnp.float32),
            cb_all.reshape(-1, NCHUNK))[0]
    cum = jnp.cumsum(hist.reshape(-1)[:nb_pad].astype(jnp.int32))
    g_first = jnp.maximum(cum - 1, 0)
    g0r = (g_first // 16) * 16
    # Smallest valid window for this data: block b's window must reach
    # the owner of its last slot, upper-bounded by g_first[b+1] (the
    # owner of the next block's first slot; rows past it compare at
    # starts > slot and contribute nothing). Blocks at/past ``total``
    # are excluded: their keys are overwritten by the j >= total
    # INT_MAX guard regardless of window (and their saturated g_first
    # would otherwise inflate ``needed`` to the table size).
    g_last_ub = jnp.concatenate([g_first[1:], g_first[-1:]])
    live_blk = block_starts < jnp.asarray(total, jnp.int32)
    needed = jnp.max(jnp.where(live_blk, g_last_ub - g0r, 0)) + 1

    # per-block channel baselines = cumulative values at g0r-1 (all rows
    # below g0r are active and precede every slot of the block); a
    # pipelined [NB, 128] VMEM operand (channels in lanes 1..5).
    idx = g0r - 1
    safe = jnp.maximum(idx, 0)
    base = jnp.stack([
        jnp.zeros_like(g0r, jnp.float32),
        starts_c[safe].astype(jnp.float32),
        x0_c[safe].astype(jnp.float32),
        y0_c[safe].astype(jnp.float32),
        w_c[safe].astype(jnp.float32),
        (safe + 1).astype(jnp.float32),               # cum active count
    ], axis=1)
    base = jnp.where((idx >= 0)[:, None], base, 0.0)  # [NB, 6]
    base = jnp.pad(base, ((0, 0), (0, 128 - base.shape[1])))

    out_spec = pl.BlockSpec((GROUP, B), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_pad // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # table (HBM)
            pl.BlockSpec((GROUP, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # baselines
        ],
        out_specs=[out_spec, out_spec] if wide else out_spec,
        scratch_shapes=[
            pltpu.VMEM((GROUP, 8, B), jnp.float32),    # phase-1 sums
            pltpu.VMEM((4, window, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    shape1 = jax.ShapeDtypeStruct((nb_pad, B), jnp.int32)
    keys = pl.pallas_call(
        partial(_kernel, gid_bits, tiles_x, window, wide),
        out_shape=[shape1, shape1] if wide else shape1,
        grid_spec=grid_spec,
        interpret=interpret,
    )(g0r, jnp.asarray(total, jnp.int32).reshape(1), table, base)
    if wide:
        return (keys[0].reshape(p_pad)[:pair_budget],
                keys[1].reshape(p_pad)[:pair_budget]), needed
    return keys.reshape(p_pad)[:pair_budget], needed
