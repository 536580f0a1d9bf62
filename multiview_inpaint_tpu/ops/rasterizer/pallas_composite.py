"""Fused Pallas compositing kernel — the hot path of the rasterizer.

Where the XLA path (``composite.py``) materializes [tiles, pixels, chunk]
alpha tensors in HBM and pays the full per-tile splat budget everywhere,
this kernel:

- streams each tile's splats straight from a **pair-sorted attribute
  array** ``attrs [P, 16]`` in HBM (one XLA gather builds it — the
  kernel consumes the gather's natural row-major layout, so no relayout
  copy exists on either side; tiles own contiguous slices, like the
  CUDA design's sorted key ranges),
- loops over 128-splat chunks with a ``while_loop`` that **exits early**
  when the tile's transmittance saturates (max over pixels < 1e-4) or the
  segment is exhausted — empty tiles do zero compute,
- keeps every intermediate in VMEM as [CHUNK splats, 256 px] blocks
  (splats ride sublanes, pixels ride lanes — the orientation in which
  per-splat scalars broadcast along lanes and the prefix/color matmuls
  are MXU-native), with color/depth accumulation as a
  [4, CHUNK] x [CHUNK, PIX] matmul,
- prefetches the NEXT tile's first chunk during the current tile's
  compute (per-tile scratch slot pairs keyed on row parity) and
  double-buffers within the tile.

Packed attribute columns (lane dim): 0 mean_x, 1 mean_y, 2 conic_a,
3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b, 9 depth, 10-15 pad.
Output per tile: [8, 256] = rows (r, g, b, depth, final_T, pad...).

Forward-only: gradients route through ``pallas_backward`` via
``jax.custom_vjp`` — see ``api.render(backend=...)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import ALPHA_MIN, DEPTH_EMPTY, T_STOP

TILE_H = 16
TILE_W = 16
PIX = TILE_H * TILE_W  # 256
CHUNK = 128
NROWS = 16  # packed attribute columns (see layout above)


def _splat_cumsum(x, exclusive: bool = False):
    """Cumsum along the sublane (first) axis of a [CHUNK, ..] block, as
    a triangular-ones MXU matmul (no cumsum primitive in Mosaic);
    ``exclusive`` uses the strictly-lower triangle. The operand rides as
    a manual hi/lo bf16 split — two single-pass bf16 matmuls with f32
    accumulation reach ~2^-16 relative accuracy at 1/3 the cost of
    Precision.HIGHEST (Mosaic supports neither HIGH nor f32-input dots
    without full passes); a Hillis-Steele rotate-scan on the VPU
    measured *slower* than the MXU matmul on v5e. The ones matrix is
    exact in bf16, so only x is split."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = ((cols < rows) if exclusive else (cols <= rows)).astype(
        jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(v):
        return jax.lax.dot_general(
            tri, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return dot(hi) + dot(lo)


def _kernel(group, tiles_x, tiles_y, starts_ref, counts_ref, attrs_ref,
            bg_ref, out_ref, scratch, sems):
    t = pl.program_id(0)
    txg = pl.program_id(1)

    def issue_chunk0(row, slot):
        # Prefetch a tile's first chunk while its predecessor composites:
        # with ~1.6 chunks per tile the first-chunk DMA latency would
        # otherwise be exposed on almost every tile.
        start = pl.multiple_of(starts_ref[row], CHUNK)

        @pl.when(counts_ref[row] > 0)
        def _():
            pltpu.make_async_copy(
                attrs_ref.at[pl.ds(start, CHUNK), :], scratch.at[slot],
                sems.at[slot]).start()

    @pl.when(jnp.logical_and(t == 0, txg == 0))
    def _():
        issue_chunk0(0, 0)

    def one_tile(g, _):
        tx = txg * group + g
        # Tile pixel coordinates [1, PIX].
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        px = (tx * TILE_W + jnp.mod(lin, TILE_W)).astype(jnp.float32)
        py = (t * TILE_H + lin // TILE_W).astype(jnp.float32)

        row = t * tiles_x + tx
        start = pl.multiple_of(starts_ref[row], CHUNK)
        count = counts_ref[row]
        n_chunks = pl.cdiv(count, CHUNK)
        # Consecutive tiles (incl. across grid steps) alternate scratch
        # slot pairs, keyed on global row parity.
        base = (row % 2) * 2

        def get_dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                attrs_ref.at[pl.ds(start + chunk_idx * CHUNK, CHUNK), :],
                scratch.at[slot],
                sems.at[slot],
            )

        # This tile's chunk 0 is already in flight (issued by the
        # previous tile / grid step); launch the successor's now (rows
        # are globally consecutive, even across grid steps). The
        # successor uses the OTHER slot pair, and its predecessor (two
        # tiles back) has fully retired, so no slot conflict.
        @pl.when(row + 1 < tiles_x * tiles_y)
        def _():
            issue_chunk0(row + 1, ((row + 1) % 2) * 2)

        def cond(state):
            i, t_carry, _, _ = state
            return jnp.logical_and(i < n_chunks,
                                   jnp.max(t_carry) >= T_STOP)

        def body(state):
            i, t_carry, rgb_acc, d_acc = state

            @pl.when(i + 1 < n_chunks)
            def _():
                get_dma(base + (i + 1) % 2, i + 1).start()

            get_dma(base + i % 2, i).wait()
            a = scratch[base + i % 2]  # [CHUNK, NROWS]

            sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            valid = (i * CHUNK + sub) < count  # [CHUNK, 1]

            dx = px - a[:, 0:1]          # [CHUNK, PIX]
            dy = py - a[:, 1:2]
            power = (-0.5 * (a[:, 2:3] * dx * dx + a[:, 4:5] * dy * dy)
                     - a[:, 3:4] * dx * dy)
            alpha = jnp.minimum(0.99, a[:, 5:6] * jnp.exp(power))
            alpha = jnp.where(
                (alpha >= ALPHA_MIN) & valid & (power <= 0.0), alpha, 0.0)
            logs = jnp.log1p(-alpha)
            # exclusive prefix -> T entering each splat directly; the
            # inclusive-prefix + divide variant measured 0.5 ms/frame
            # slower at 1080p (A/B, PERF.md)
            cum_ex = _splat_cumsum(logs, exclusive=True)
            t_in = t_carry * jnp.exp(cum_ex)
            t_out = t_in * (1.0 - alpha)
            contrib = t_out >= T_STOP
            w = jnp.where(contrib, alpha * t_in, 0.0)  # [CHUNK, PIX]

            # [8, CHUNK] @ [CHUNK, PIX] -> MXU. Manual hi/lo bf16 split
            # (~2^-16 relative accuracy; Precision.HIGHEST's 6 passes
            # measured 1.3 ms/frame slower at 1080p, A/B in PERF.md).
            # The cd hi and lo terms ride separate LANES of one packed
            # operand, so the split costs 2 passes instead of 3.
            cd = a[:, 6:10]                            # [CHUNK, 4]
            whi = w.astype(jnp.bfloat16)
            wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            cdb = cd.astype(jnp.bfloat16)
            cdl = (cd - cdb.astype(jnp.float32)).astype(jnp.bfloat16)
            cd8 = jnp.concatenate([cdb, cdl], axis=1)  # [CHUNK, 8]

            def cdot(c, v):  # [CHUNK,k]^T @ [CHUNK,PIX] -> [k,PIX]
                return jax.lax.dot_general(
                    c, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc8 = cdot(cd8, whi)          # rows 0-3 cdb·whi, 4-7 cdl·whi
            acc = acc8[0:4, :] + acc8[4:8, :] + cdot(cdb, wlo)
            rgb_acc = rgb_acc + acc[0:3, :]
            d_acc = d_acc + acc[3:4, :]
            # VPU sublane reduce: an MXU ones-row dot here measured a
            # 4 ms/frame REGRESSION (small-N matmuls stall the pipe).
            t_next = t_carry * jnp.exp(
                jnp.sum(jnp.where(contrib, logs, 0.0), axis=0,
                        keepdims=True))
            return i + 1, t_next, rgb_acc, d_acc

        init = (jnp.int32(0), jnp.ones((1, PIX), jnp.float32),
                jnp.zeros((3, PIX), jnp.float32),
                jnp.zeros((1, PIX), jnp.float32))
        i_end, t_fin, rgb_acc, d_acc = jax.lax.while_loop(cond, body,
                                                          init)

        # Saturation exit leaves chunk i_end's DMA in flight (started in
        # body i_end-1). Retire it, or its stale semaphore signal would
        # let the tile two rows ahead read its slot mid-copy.
        @pl.when(i_end < n_chunks)
        def _():
            get_dma(base + i_end % 2, i_end).wait()

        bg = bg_ref[0:3, 0:1]  # [3, 1]
        rgb = rgb_acc + t_fin * bg
        dep = d_acc + t_fin * DEPTH_EMPTY
        out_ref[0, g] = jnp.concatenate(
            [rgb, dep, t_fin, jnp.zeros((3, PIX), jnp.float32)], axis=0)
        return 0

    jax.lax.fori_loop(0, group, one_tile, 0)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "interpret"))
def composite_pallas(attrs: jnp.ndarray, seg_start: jnp.ndarray,
                     counts: jnp.ndarray, bg_color: jnp.ndarray,
                     tiles_x: int, tiles_y: int, interpret: bool = False):
    """attrs [P, NROWS] pair-sorted packed attrs; returns [T, 8, PIX]."""
    num_tiles = tiles_x * tiles_y
    # Batch GROUP tiles per grid step: per-step launch overhead (~2 us)
    # dominates at 1 tile/step (8k steps at 1080p); the fori_loop
    # amortizes it 8x. GROUP must divide tiles_x.
    group = next(g for g in (8, 6, 5, 4, 3, 2, 1) if tiles_x % g == 0)
    bg = jnp.zeros((8, 1), jnp.float32).at[0:3, 0].set(bg_color)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x // group),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # attrs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec((1, group, 8, PIX),
                               lambda t, txg, *_: (t, txg, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, CHUNK, NROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, group, tiles_x, tiles_y),
        out_shape=jax.ShapeDtypeStruct((tiles_y, tiles_x, 8, PIX),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(num_tiles) * PIX * CHUNK * 24,
            bytes_accessed=int(attrs.size) * 4 + num_tiles * PIX * 32,
            transcendentals=int(num_tiles) * PIX * CHUNK * 2,
        ),
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), attrs, bg)
    return out.reshape(num_tiles, 8, PIX)


def pack_attrs(means2d, conic, opacity, color, depth) -> jnp.ndarray:
    """Dense per-gaussian attrs -> packed [N, NROWS] (layout above)."""
    n = means2d.shape[0]
    return jnp.concatenate([
        means2d,                       # 0,1
        conic,                         # 2,3,4
        opacity[:, None],              # 5
        color,                         # 6,7,8
        depth[:, None],                # 9
        jnp.zeros((n, NROWS - 10), jnp.float32),
    ], axis=1)
