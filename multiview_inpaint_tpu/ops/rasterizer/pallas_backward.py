"""Pallas backward kernel for the fused compositing pass.

Makes ``render(backend="pallas")`` fully differentiable without paying the
XLA path's materialized [tiles, pixels, chunk] backward. The gradient
identity (same as the CUDA rasterizer's backward, re-derived for the
forward-order scan):

    A_i  = g_rgb . c_i + g_d . d_i                (per pixel, per splat)
    S_i  = TotalContrib - Prefix_i                (suffix, from outputs)
    dL/dalpha_i = T_i A_i - (S_i + T_fin B) / (1 - alpha_i)
    B    = g_rgb . bg + 15 g_d - g_alphaOut

where TotalContrib = g_rgb.(C - T_fin bg) + g_d.(D - 15 T_fin) comes from
the saved forward outputs — so backward is a SINGLE forward-order pass
over the same chunk stream (recomputing alpha/T, carrying the prefix),
with every per-splat parameter gradient a [PIX, CHUNK] column reduction
(MXU matmuls against g and ones).

Per-pair gradients are DMA'd to a [NROWS, P] output over the same
128-aligned enclosing windows the forward streams from (segments are
UNALIGNED — no padding pairs exist in the sorted layout). Adjacent tiles
whose segments straddle a window boundary share that window: the later
tile merges the earlier tile's already-written lanes (kept in a VMEM
carry buffer — the grid is sequential on TPU, so the carry is always the
previous nonempty tile's last written window) before writing. The
reduction to per-gaussian gradients is the VJP of the XLA gather that
built the pair array, handled by autodiff in ``api.render``.

Round 3 (mirroring the forward-kernel ablations, PERF.md): tiles are
processed GROUP-at-a-time per grid step, the pixel-coordinate and
moments-basis setup is hoisted out of the group loop, the alpha
recompute uses the fma-chain power form, and the saturation early-exit
is a static knob (default off — identical output, and the per-chunk
vector->scalar sync costs more than it saves on short-segment scenes).

Grad row layout: 0 d_mean_x, 1 d_mean_y, 2 d_conic_a, 3 d_conic_b,
4 d_conic_c, 5 d_opacity, 6-8 d_rgb, 9 d_depth (= NROWS rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import DEPTH_EMPTY, T_STOP
from .pallas_composite import (CHUNK, NROWS, PIX, TILE_H, TILE_W,
                               _lane_cumsum)


def _bwd_kernel(group, tiles_x, tile_h, tile_w, early_exit, starts_ref,
                counts_ref, row0_ref, attrs_ref, g_ref, out8_ref, bg_ref,
                gout_ref, scratch, gscratch, carry, sems, gsem):
    pix = tile_h * tile_w
    t = pl.program_id(0)
    txg = pl.program_id(1)
    num_rows = pl.num_programs(0) * tiles_x

    # Hoisted out of the group loop (identical for every tile): local
    # pixel coords and the [6, pix] moments basis {1, px, py, px^2,
    # py^2, px*py} — the backward's column reductions difference
    # polynomial moments, and local coords (<= 15) keep that
    # cancellation-free.
    lin = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    pxl = jnp.mod(lin, tile_w).astype(jnp.float32)
    pyl = (lin // tile_w).astype(jnp.float32)
    basis = jnp.concatenate(
        [jnp.ones((1, pix), jnp.float32), pxl.T, pyl.T,
         (pxl * pxl).T, (pyl * pyl).T, (pxl * pyl).T], axis=0)
    bb = basis.astype(jnp.bfloat16)
    del bg_ref  # background now composited (and differentiated) in XLA

    def win_base(r):
        # Unaligned segments: DMA the 128-aligned enclosing window (a
        # Mosaic-provable offset) and mask out-of-segment lanes.
        return pl.multiple_of((starts_ref[r] // CHUNK) * CHUNK, CHUNK)

    def issue_chunk0(prow, slot):
        @pl.when(counts_ref[prow] > 0)
        def _():
            pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(win_base(prow), CHUNK)],
                scratch.at[slot], sems.at[slot]).start()

    @pl.when(jnp.logical_and(t == 0, txg == 0))
    def _():
        issue_chunk0(0, 0)

    def one_tile(g_idx, _):
        tx = txg * group + g_idx
        ox = (tx * tile_w).astype(jnp.float32)
        # Band mode: local row t -> global row row0 + t*stride
        # (bit-matches the forward kernel's oy; (0, 1) for whole frames).
        oy = ((row0_ref[0] + t * row0_ref[1]) * tile_h).astype(
            jnp.float32)

        row = t * tiles_x + tx
        start = win_base(row)
        off = starts_ref[row] - start
        count = counts_ref[row]
        seg_end = off + count
        # Empty tiles MUST run zero chunks (cdiv(off, CHUNK) is 1 when an
        # empty tile's start is unaligned): the chunk-0 DMA is only
        # issued for count > 0 — waiting on it deadlocks — and the
        # zero-fill would clobber the shared window the previous tile
        # just wrote.
        n_chunks = jnp.where(count > 0, pl.cdiv(seg_end, CHUNK), 0)

        # Tiles alternate scratch slot pairs on global row parity; a
        # tile's chunk 0 is prefetched by its predecessor (incl. across
        # grid steps) so the first-chunk DMA latency overlaps the
        # predecessor's compute.
        base = (row % 2) * 2

        @pl.when(row + 1 < num_rows)
        def _():
            issue_chunk0(row + 1, ((row + 1) % 2) * 2)

        def get_dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(start + chunk_idx * CHUNK, CHUNK)],
                scratch.at[slot], sems.at[slot])

        def _bwd_tile():
            # Upstream grads + RAW forward outputs for this tile:
            # [8, PIX]. The forward emits bg-free accumulators and the
            # caller composites the background in XLA, so the incoming
            # row-4 cotangent already carries the g_rgb.bg +
            # DEPTH_EMPTY*g_d terms via autodiff — B collapses to g_t
            # and TotalContrib to a plain dot with the raw rows.
            g = g_ref[0, g_idx]   # rows: 0-2 g_rgb, 3 g_depth, 4 dL/dT
            fwd = out8_ref[0, g_idx]  # rows: 0-3 raw rgb+depth, 4 T_fin
            g_rgb = g[0:3, :].T            # [PIX, 3]
            g_d = g[3:4, :].T              # [PIX, 1]
            b_term = g[4:5, :].T           # [PIX, 1]
            t_fin = fwd[4:5, :].T          # [PIX, 1]
            total_contrib = (jnp.sum(g_rgb * fwd[0:3, :].T, axis=1,
                                     keepdims=True)
                             + g_d * fwd[3:4, :].T)

            log_stop = jnp.log(jnp.float32(T_STOP))

            def cond(state):
                i, lt_carry, _ = state
                if not early_exit:
                    return i < n_chunks  # see forward-kernel note
                return jnp.logical_and(i < n_chunks,
                                       jnp.max(lt_carry) >= log_stop)

            def body(state):
                # Log-space transmittance carry, bit-matching the forward
                # kernel's recompute (see its note).
                i, lt_carry, prefix = state

                @pl.when(i + 1 < n_chunks)
                def _():
                    get_dma(base + (i + 1) % 2, i + 1).start()

                get_dma(base + i % 2, i).wait()
                a = scratch[base + i % 2]  # [NROWS, CHUNK]

                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                sl = i * CHUNK + lane
                valid = (sl >= off) & (sl < seg_end)
                # Tile-local dx (bit-matches the forward kernel's form).
                dx = pxl - (a[0:1, :] - ox)
                dy = pyl - (a[1:2, :] - oy)
                # fma-chain power (bit-matches the forward kernel's form).
                qxx = -0.5 * a[2:3, :]
                qxy = -a[3:4, :]
                qyy = -0.5 * a[4:5, :]
                u = qxx * dx + qxy * dy
                power = u * dx + (qyy * dy) * dy
                alpha_raw = a[5:6, :] * jnp.exp(power)
                unclipped = alpha_raw < 0.99
                alpha = jnp.minimum(0.99, alpha_raw)
                live = (alpha >= a[10:11, :]) & valid & (power <= 0.0)
                alpha = jnp.where(live, alpha, 0.0)
                logs = jnp.log1p(-alpha)
                # Exclusive prefix, matching the forward kernel's recompute.
                cum_ex = _lane_cumsum(logs, exclusive=True)
                t_in = jnp.exp(cum_ex + lt_carry)
                t_out = t_in * (1.0 - alpha)
                contrib = t_out >= T_STOP
                w = jnp.where(contrib, alpha * t_in, 0.0)

                # A_i and running prefix of w_j A_j (inclusive). 3-pass hi/lo
                # bf16 split: HIGHEST costs 6 full passes (and the k=4
                # contraction pads to 128 on the MXU either way).
                cd = jnp.concatenate([a[6:9, :], a[9:10, :]], axis=0)
                g4 = jnp.concatenate([g_rgb, g_d], axis=1)         # [PIX,4]
                g4h = g4.astype(jnp.bfloat16)
                g4l = (g4 - g4h.astype(jnp.float32)).astype(jnp.bfloat16)
                cdh = cd.astype(jnp.bfloat16)
                cdl = (cd - cdh.astype(jnp.float32)).astype(jnp.bfloat16)

                def adot(u_, v_):
                    return jax.lax.dot_general(
                        u_, v_, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                A = adot(g4h, cdh) + adot(g4l, cdh) + adot(g4h, cdl)
                wA = w * A
                prefix_i = prefix + _lane_cumsum(wA)               # inclusive
                suffix = total_contrib - prefix_i                  # [PIX,CHUNK]

                # 1/(1-alpha) as exp(-log1p(-alpha)): logs is already in
                # hand and the hardware exp is far cheaper than a divide.
                rcp_one_m = jnp.exp(-logs)
                d_alpha = jnp.where(
                    contrib & live,
                    t_in * A - (suffix + t_fin * b_term) * rcp_one_m, 0.0)

                # alpha -> (opacity, power); clip gate.
                d_alpha_eff = jnp.where(unclipped, d_alpha, 0.0)
                d_power = d_alpha_eff * alpha        # alpha=op*exp(power)

                # ONE pixel-moments matmul replaces six per-channel column
                # sums: dx = px - mx is separable, so every Σ_p d_power·poly
                # (dx, dy) is a linear combination of Σ_p d_power·{1, px, py,
                # px², py², px·py}. Local means pair with the local basis.
                # 2-pass split: the basis entries are small integers (<= 225),
                # exact in bf16, so only d_power needs hi/lo terms.
                dph = d_power.astype(jnp.bfloat16)
                dpl = (d_power - dph.astype(jnp.float32)).astype(jnp.bfloat16)
                mom = (jax.lax.dot_general(
                           bb, dph, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           bb, dpl, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32))  # [6, CHUNK]
                mxl = a[0:1, :] - ox                             # [1, CHUNK]
                myl = a[1:2, :] - oy
                m0 = mom[0:1, :]
                mx_, my_ = mom[1:2, :], mom[2:3, :]
                mxx, myy, mxy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
                cx = mx_ - mxl * m0              # Σ d_power·dx
                cy = my_ - myl * m0
                cxx = mxx - 2.0 * mxl * mx_ + mxl * mxl * m0   # Σ d_power·dx²
                cyy = myy - 2.0 * myl * my_ + myl * myl * m0
                cxy = mxy - mxl * my_ - myl * mx_ + mxl * myl * m0
                d_a = -0.5 * cxx
                d_b = -cxy
                d_c = -0.5 * cyy
                # power depends on means via dx = px - mx:
                # dpower/dmx = a dx + b dy ; dpower/dmy = c dy + b dx
                d_mx = a[2:3, :] * cx + a[3:4, :] * cy
                d_my = a[4:5, :] * cy + a[3:4, :] * cx
                # d_op = d_power/op wherever nonzero (live => op >= alpha >=
                # ALPHA_MIN, so the clamp only guards exact-zero rows).
                d_opacity = m0 / jnp.maximum(a[5:6, :], 1e-20)

                # color/depth grads: w^T @ [g_rgb | g_d]; 3-pass hi/lo bf16
                # split (lane-packing the terms forces unaligned-lane output
                # slices -> relayouts; see the forward kernel's note).
                whi = w.astype(jnp.bfloat16)
                wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                g4hi = g4.astype(jnp.bfloat16)
                g4lo = (g4 - g4hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def wdot(u_, v_):
                    return jax.lax.dot_general(
                        u_, v_, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                wg = wdot(whi, g4hi) + wdot(wlo, g4hi) + wdot(whi, g4lo)

                grow = jnp.concatenate([
                    d_mx, d_my, d_a, d_b, d_c, d_opacity, wg.T,
                    jnp.zeros((NROWS - 10, CHUNK), jnp.float32)],
                    axis=0)  # [NROWS, CHUNK]
                # Window-boundary merge: when this tile's segment starts mid-
                # window (off > 0), the window's first ``off`` lanes hold the
                # previous nonempty tile's already-written gradients — whose
                # last written window is by construction THIS window, still
                # sitting in the VMEM carry buffer. Preserve those lanes.
                # (Out-of-segment lanes of grow are exact zeros: every grad
                # is a product with the masked alpha/w.)
                grow = jnp.where((i == 0) & (lane < off), carry[:, :], grow)
                carry[:, :] = grow
                # Double-buffered writeback: retire the slot's previous DMA
                # just before reuse instead of stalling on every chunk.
                @pl.when(i >= 2)
                def _():
                    pltpu.make_async_copy(
                        gscratch.at[i % 2],
                        gout_ref.at[:, pl.ds(start + (i - 2) * CHUNK, CHUNK)],
                        gsem.at[i % 2]).wait()
                gscratch[i % 2] = grow
                pltpu.make_async_copy(
                    gscratch.at[i % 2],
                    gout_ref.at[:, pl.ds(start + i * CHUNK, CHUNK)],
                    gsem.at[i % 2]).start()

                lt_next = lt_carry + jnp.sum(
                    jnp.where(contrib, logs, 0.0), axis=1, keepdims=True)
                prefix_next = prefix + jnp.sum(wA, axis=1, keepdims=True)
                return i + 1, lt_next, prefix_next

            init = (jnp.int32(0), jnp.zeros((pix, 1), jnp.float32),
                    jnp.zeros((pix, 1), jnp.float32))
            i_stop, _, _ = jax.lax.while_loop(cond, body, init)

            # Retire the in-flight writebacks of the last (up to) two chunks.
            def drain(j, _):
                pltpu.make_async_copy(
                    gscratch.at[j % 2],
                    gout_ref.at[:, pl.ds(start + j * CHUNK, CHUNK)],
                    gsem.at[j % 2]).wait()
                return 0

            jax.lax.fori_loop(jnp.maximum(i_stop - 2, 0), i_stop, drain, 0)

            # Saturation exit leaves chunk i_stop's read DMA in flight
            # (started in body i_stop-1). Retire it, or its stale semaphore
            # signal would let the next tile read its slot mid-copy. (No-op
            # when early_exit=False: i_stop == n_chunks.)
            @pl.when(i_stop < n_chunks)
            def _():
                get_dma(base + i_stop % 2, i_stop).wait()

            # Early-exit leaves later chunks unwritten in the ANY-space
            # output — zero-fill so the downstream grad reduction sees clean
            # zeros. Only chunks >= 1 can be zero-filled (chunk 0 always runs
            # when count > 0), so no prev-tile lanes are clobbered; the carry
            # must track the last written window for the NEXT tile's
            # boundary merge.
            def zero_fill(i, _):
                gscratch[i % 2] = jnp.zeros((NROWS, CHUNK), jnp.float32)
                cp = pltpu.make_async_copy(
                    gscratch.at[i % 2],
                    gout_ref.at[:, pl.ds(start + i * CHUNK, CHUNK)],
                    gsem.at[i % 2])
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(i_stop, n_chunks, zero_fill, 0)

            @pl.when(i_stop < n_chunks)
            def _():
                carry[:, :] = jnp.zeros((NROWS, CHUNK), jnp.float32)

        # Empty tiles own zero pairs — nothing to write; skip the whole
        # per-tile setup (the [8, PIX] g/fwd reads, three narrow
        # transposes and the TotalContrib reduction run ~0.3 us/tile).
        @pl.when(count > 0)
        def _():
            _bwd_tile()

        return 0

    jax.lax.fori_loop(0, group, one_tile, 0)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_h",
                                   "tile_w", "interpret", "early_exit"))
def composite_pallas_bwd(attrs_t: jnp.ndarray, seg_start: jnp.ndarray,
                         counts: jnp.ndarray, bg_color: jnp.ndarray,
                         tiles8: jnp.ndarray, g_tiles8: jnp.ndarray,
                         tiles_x: int, tiles_y: int, tile_h: int = TILE_H,
                         tile_w: int = TILE_W,
                         interpret: bool = False,
                         early_exit: bool = False,
                         row0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Returns d(attrs_t) [NROWS, P_aligned].

    tiles8 / g_tiles8: forward outputs and their upstream grads,
    [num_tiles, 8, PIX] (rows 0-2 rgb, 3 depth, 4 final-T / alpha grads —
    caller converts d(alpha_out) into row 4 with the proper sign).
    ``row0``: global tile-row offset (band mode; see composite_pallas).
    """
    pix = tile_h * tile_w
    num_tiles = tiles_x * tiles_y
    p_aligned = attrs_t.shape[1]
    group = next(g for g in (8, 6, 5, 4, 3, 2, 1) if tiles_x % g == 0)
    bg = jnp.zeros((8, 1), jnp.float32).at[0:3, 0].set(bg_color)
    t8 = tiles8.reshape(tiles_y, tiles_x, 8, pix)
    g8 = g_tiles8.reshape(tiles_y, tiles_x, 8, pix)
    from .pallas_composite import _row_map_arr
    row0_arr = _row_map_arr(row0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_y, tiles_x // group),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # attrs (HBM)
            pl.BlockSpec((1, group, 8, pix),
                         lambda t, txg, *_: (t, txg, 0, 0),
                         memory_space=pltpu.VMEM),  # upstream grads
            pl.BlockSpec((1, group, 8, pix),
                         lambda t, txg, *_: (t, txg, 0, 0),
                         memory_space=pltpu.VMEM),  # forward outputs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, NROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            # carry: last written grad window, persists across grid
            # steps (sequential TPU grid) for the boundary merge.
            pltpu.VMEM((NROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        partial(_bwd_kernel, group, tiles_x, tile_h, tile_w, early_exit),
        out_shape=jax.ShapeDtypeStruct((NROWS, p_aligned), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), row0_arr,
      attrs_t, g8, t8, bg)
    return grads
