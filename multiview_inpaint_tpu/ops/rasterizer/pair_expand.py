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
[K, 8] (one dot), plus a per-block baseline. The kernel emits the final
packed sort key ``tile * 2^gid_bits + compact_rank`` per slot directly.

All integer math rides f32 (exact below 2^24; asserted) because Mosaic
matmuls want it and the VPU has no integer divide anyway.

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

B = 512          # pair slots per block
K = B + 16       # gaussian window per block (starts strictly increase:
                 # <= B-1 starts inside a block, +8 alignment, +8 margin)
GROUP = 8        # blocks per grid step (amortizes per-step overhead)
BIG = 3.0e7      # sentinel start: beyond any slot index, f32-exact enough
INT_MAX = 2 ** 31 - 1  # python int: jnp constants would be captured consts


def _split3(x):
    """Exact 3-way bf16 split of integer-valued f32 (< 2^23): x = a+b+c
    with every term bf16-representable — three single-pass MXU matmuls
    reconstruct the exact integer dot (f32 accumulation), at half the
    cost of Precision.HIGHEST's six passes."""
    a = x.astype(jnp.bfloat16)
    r1 = x - a.astype(jnp.float32)
    b = r1.astype(jnp.bfloat16)
    c = (r1 - b.astype(jnp.float32)).astype(jnp.bfloat16)
    return a, b, c


def _kernel(gid_bits, tiles_x, g0r_ref, total_ref, base_ref, table_ref,
            out_ref, scratch, sems):
    step = pl.program_id(0)
    total = total_ref[0]

    def get_dma(g):
        blk = step * GROUP + g
        g0 = pl.multiple_of(g0r_ref[blk], 8)
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
        tab = scratch[g % 2]                       # [K, 128] f32

        # slots of this block along lanes
        j = (blk * B + jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
             ).astype(jnp.float32)                 # [1, B]
        ind = (tab[:, 0:1] <= j).astype(jnp.bfloat16)  # [K, B]
        # [128, B] = table^T @ indicator; channels ride lanes 0..7 of
        # the 128-lane rows (Mosaic requires full-lane-width DMAs), so
        # the dot computes 120 zero rows alongside — still cheap.
        t1, t2, t3 = _split3(tab)

        def dot(lhs):
            return jax.lax.dot_general(
                lhs, ind, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        vals = dot(t1) + dot(t2) + dot(t3)
        starts = vals[1:2, :] + base_ref[blk * 8 + 1]
        x0 = vals[2:3, :] + base_ref[blk * 8 + 2]
        y0 = vals[3:4, :] + base_ref[blk * 8 + 3]
        w = jnp.maximum(vals[4:5, :] + base_ref[blk * 8 + 4], 1.0)
        rank = vals[5:6, :] + base_ref[blk * 8 + 5] - 1.0

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

    def delta(v):
        vf = jnp.where(active_c, v.astype(jnp.float32), 0.0)
        return jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                         vf]))

    # table lanes: [starts_value, d_starts, d_x0, d_y0, d_w, d_cnt] in
    # lanes 0..5 of 128-lane rows (Mosaic DMA slices must span the full
    # lane tile; sublane offsets only need 8-alignment)
    chans = jnp.stack([
        starts_f,
        delta(starts_c),
        delta(x0_c),
        delta(y0_c),
        delta(w_c),
        active_c.astype(jnp.float32),
    ], axis=1)                                        # [N, 6]
    rows = -(-(n + K) // 8) * 8
    table = jnp.zeros((rows, 128), jnp.float32)
    table = table.at[:, 0].set(BIG)  # pad rows never fire
    table = table.at[:n, :6].set(chans)

    # per-block first-gaussian window origin (8-aligned)
    block_starts = jnp.arange(nb_pad, dtype=jnp.int32) * B
    g_first = jnp.maximum(
        jnp.searchsorted(starts_f, block_starts.astype(jnp.float32),
                         side="right").astype(jnp.int32) - 1, 0)
    g0r = (g_first // 8) * 8

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
            pltpu.VMEM((2, K, 128), jnp.float32),
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
