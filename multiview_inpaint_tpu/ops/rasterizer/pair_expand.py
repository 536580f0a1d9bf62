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

Cost shaping (measured on v5e; the naive f32 variant was a 4.5 ms
regression):
  - The table rows are 128 lanes wide (Mosaic DMA minimum) but only ~6
    channels are live, so exact-integer matmul passes are almost free
    lane-wise: instead of 2-3 sequential precision-split matmuls, the
    hi/lo bf16 split terms of each delta channel ride SEPARATE LANES of
    ONE bf16 matmul, and the split is summed from the output rows.
  - B=128-slot blocks minimize the contraction window (K=160) and the
    MXU tile count per slot; the full kernel is ~43 G MAC at 1080p.
  - The table itself is bf16 (exactness notes below), halving HBM
    traffic; ``starts`` rides three bf16 lanes (hi/mid/lo) that
    reconstruct the exact f32 value for the indicator compare.

Exactness: every dotted lane is an integer-valued delta small enough
for a 2-term bf16 split (bf16 represents integers <= 256 exactly, and
x - bf16(x) <= ulp/2 <= 256 for x < 2^17): d_starts = per-gaussian
pair count <= num_tiles < 2^16, d_x0/d_y0/d_w are tile coords < 257.
``starts`` values themselves (< pair_budget < 2^24) are never dotted,
only compared, and 3 bf16 terms reconstruct any integer < 2^24's f32
value exactly. Accumulation is f32 (`preferred_element_type`).

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

B = 128          # pair slots per block
K = B + 32       # gaussian window per block: <= B-1 starts inside a
                 # block, +16 window alignment (bf16 sublane tile), +
                 # margin; multiple of 16.
GROUP = 8        # blocks per grid step (amortizes per-step overhead)
BIG = 3.0e7      # sentinel start: beyond any slot index, f32-exact enough
INT_MAX = 2 ** 31 - 1  # python int: jnp constants would be captured consts

# Lane map of the bf16 table (within 128-lane rows):
#   0,1,2: starts hi/mid/lo (indicator compare operand, never dotted)
#   3,4:   d_starts hi/lo
#   5:     d_x0    6: d_y0    7: d_w    8: d_count
_L_S0, _L_S1, _L_S2 = 0, 1, 2
_L_DS_HI, _L_DS_LO, _L_DX, _L_DY, _L_DW, _L_DC = 3, 4, 5, 6, 7, 8


def _kernel(gid_bits, tiles_x, g0r_ref, total_ref, base_ref, table_ref,
            out_ref, scratch, sems):
    step = pl.program_id(0)
    total = total_ref[0]

    def get_dma(g):
        blk = step * GROUP + g
        g0 = pl.multiple_of(g0r_ref[blk], 16)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(g0, K), :], scratch.at[g % 2],
            sems.at[g % 2])

    get_dma(0).start()

    def one_block(g, _):
        blk = step * GROUP + g

        @pl.when(g + 1 < GROUP)
        def _():
            get_dma(g + 1).start()

        get_dma(g).wait()
        tab = scratch[g % 2]                       # [K, 128] bf16

        # exact f32 starts from the 3-lane bf16 split
        s = (tab[:, _L_S0:_L_S0 + 1].astype(jnp.float32)
             + tab[:, _L_S1:_L_S1 + 1].astype(jnp.float32)
             + tab[:, _L_S2:_L_S2 + 1].astype(jnp.float32))   # [K, 1]
        # slots of this block along lanes
        j = (blk * B + jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
             ).astype(jnp.float32)                 # [1, B]
        ind = (s <= j).astype(jnp.bfloat16)        # [K, B]
        # ONE bf16 matmul: [128, B] = table^T @ indicator; hi/lo split
        # terms live in separate lanes and are summed from output rows.
        vals = jax.lax.dot_general(
            tab, ind, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        starts = (vals[_L_DS_HI:_L_DS_HI + 1, :]
                  + vals[_L_DS_LO:_L_DS_LO + 1, :]
                  + base_ref[blk * 8 + 1])
        x0 = vals[_L_DX:_L_DX + 1, :] + base_ref[blk * 8 + 2]
        y0 = vals[_L_DY:_L_DY + 1, :] + base_ref[blk * 8 + 3]
        w = jnp.maximum(vals[_L_DW:_L_DW + 1, :] + base_ref[blk * 8 + 4],
                        1.0)
        rank = vals[_L_DC:_L_DC + 1, :] + base_ref[blk * 8 + 5] - 1.0

        local = j - starts
        q = jnp.floor(local / w)
        r = local - q * w
        # exact-integer division correction (f32 quotient can be off by
        # one ulp at exact multiples)
        q = jnp.where(r < 0.0, q - 1.0, q)
        r = jnp.where(r < 0.0, r + w, r)
        q = jnp.where(r >= w, q + 1.0, q)
        r = jnp.where(r >= w, r - w, r)
        tile = (y0 + q) * float(tiles_x) + (x0 + r)

        key = ((tile.astype(jnp.int32) << gid_bits)
               | rank.astype(jnp.int32))
        key = jnp.where(j.astype(jnp.int32) >= total,
                        jnp.int32(INT_MAX), key)
        out_ref[pl.ds(g, 1), :] = key
        return 0

    jax.lax.fori_loop(0, GROUP, one_block, 0)


def _bf16_pair(x):
    """2-term bf16 split of small-integer-valued f32 (exact, see module
    docstring)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@partial(jax.jit, static_argnames=("n", "gid_bits", "tiles_x",
                                   "pair_budget", "interpret"))
def expand_keys(starts_c: jnp.ndarray, x0_c: jnp.ndarray,
                y0_c: jnp.ndarray, w_c: jnp.ndarray, active_c: jnp.ndarray,
                total: jnp.ndarray, n: int, gid_bits: int, tiles_x: int,
                pair_budget: int, interpret: bool = False) -> jnp.ndarray:
    """[P]-slot packed sort keys from compacted per-gaussian rects.

    Args (all [N], compacted: active (count>0) gaussians first, in depth
    rank order; ``starts_c`` strictly increasing over actives):
      starts_c: first pair slot per gaussian (int32).
      x0_c/y0_c: rect origin in tiles; w_c: rect width in tiles.
      active_c: bool, count>0 rows.
      total: [] int32 true total pair count (slots past it -> INT_MAX).
    Returns keys [pair_budget] int32 (compact-rank id space).
    """
    assert pair_budget < 2 ** 24, "slot indices must stay f32-exact"
    nb = -(-pair_budget // B)
    nb_pad = -(-nb // GROUP) * GROUP
    p_pad = nb_pad * B

    starts_f = jnp.where(active_c, starts_c.astype(jnp.float32), BIG)
    s_hi = starts_f.astype(jnp.bfloat16)
    r1 = starts_f - s_hi.astype(jnp.float32)
    s_mid = r1.astype(jnp.bfloat16)
    s_lo = (r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def delta(v):
        vf = jnp.where(active_c, v.astype(jnp.float32), 0.0)
        return jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                         vf]))

    ds_hi, ds_lo = _bf16_pair(delta(starts_c))
    chans = jnp.stack([
        s_hi, s_mid, s_lo,
        ds_hi, ds_lo,
        delta(x0_c).astype(jnp.bfloat16),
        delta(y0_c).astype(jnp.bfloat16),
        delta(w_c).astype(jnp.bfloat16),
        active_c.astype(jnp.bfloat16),
    ], axis=1)                                        # [N, 9]
    rows = -(-(n + K) // 16) * 16
    table = jnp.zeros((rows, 128), jnp.bfloat16)
    table = table.at[:, 0].set(jnp.bfloat16(BIG))  # pad rows never fire
    table = table.at[:n, :chans.shape[1]].set(chans)

    # per-block first-gaussian window origin (16-aligned: bf16 sublane
    # tile)
    block_starts = jnp.arange(nb_pad, dtype=jnp.int32) * B
    g_first = jnp.maximum(
        jnp.searchsorted(starts_f, block_starts.astype(jnp.float32),
                         side="right").astype(jnp.int32) - 1, 0)
    g0r = (g_first // 16) * 16

    # per-block channel baselines = cumulative values at g0r-1 (all rows
    # below g0r are active and precede every slot of the block)
    idx = g0r - 1
    safe = jnp.maximum(idx, 0)
    base = jnp.stack([
        jnp.zeros_like(g0r, jnp.float32),
        starts_c[safe].astype(jnp.float32),
        x0_c[safe].astype(jnp.float32),
        y0_c[safe].astype(jnp.float32),
        w_c[safe].astype(jnp.float32),
        (safe + 1).astype(jnp.float32),               # cum active count
        jnp.zeros_like(g0r, jnp.float32),
        jnp.zeros_like(g0r, jnp.float32),
    ], axis=1)
    base = jnp.where((idx >= 0)[:, None], base, 0.0)  # [NB, 8]
    base = base.reshape(-1)  # flat SMEM layout (2-D rows pad to 128
    # lanes and blow the 1 MB SMEM budget)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb_pad // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # table (HBM)
        ],
        out_specs=pl.BlockSpec((GROUP, B), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    keys = pl.pallas_call(
        partial(_kernel, gid_bits, tiles_x),
        out_shape=jax.ShapeDtypeStruct((nb_pad, B), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(g0r, jnp.asarray(total, jnp.int32).reshape(1), base, table)
    return keys.reshape(p_pad)[:pair_budget]
