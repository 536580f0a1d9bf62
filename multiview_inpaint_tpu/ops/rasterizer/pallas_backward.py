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
over the same chunk stream (recomputing alpha/T, carrying the prefix).

Blocks ride as [CHUNK splats, PIX] (same orientation as the forward
kernel: per-splat scalars broadcast along lanes). The six per-splat
parameter gradients collapse into ONE pixel-moments matmul: with
dx = px - mx separable, every sum Σ_p d_power·poly(dx,dy) is a linear
combination of the moments Σ_p d_power·{1, px, py, px², py², px·py}
= d_power [CHUNK,PIX] @ basis [PIX,6] — tile-LOCAL pixel coords keep
the recombination cancellation-free. d_opacity = M0/op since
d_op = d_power/op wherever it is nonzero.

Per-pair gradients are DMA'd to a [P_aligned, NROWS] output at the same
aligned offsets (grid is sequential on TPU — no races) in the gather's
own row-major layout; the reduction to per-gaussian gradients is the
double-sort segment reduction (``segment_reduce.gather_pairs``).

Grad column layout: 0 d_mean_x, 1 d_mean_y, 2 d_conic_a, 3 d_conic_b,
4 d_conic_c, 5 d_opacity, 6-8 d_rgb, 9 d_depth (= NROWS columns).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import ALPHA_MIN, DEPTH_EMPTY, T_STOP
from .pallas_composite import (CHUNK, NROWS, PIX, TILE_H, TILE_W,
                               _splat_cumsum)


def _bwd_kernel(starts_ref, counts_ref, attrs_ref, g_ref, out8_ref,
                bg_ref, gout_ref, scratch, gscratch, sems, gsem):
    t = pl.program_id(0)
    tiles_x = pl.num_programs(1)
    tx = pl.program_id(1)
    # Tile-LOCAL pixel coordinates [1, PIX] (cancellation-free moments).
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pxl = jnp.mod(lin, TILE_W).astype(jnp.float32)
    pyl = (lin // TILE_W).astype(jnp.float32)
    ox = jnp.float32(tx * TILE_W)
    oy = jnp.float32(t * TILE_H)

    row = t * tiles_x + tx
    start = pl.multiple_of(starts_ref[row], CHUNK)
    count = counts_ref[row]
    n_chunks = pl.cdiv(count, CHUNK)

    # Upstream grads + forward outputs for this tile: [8, PIX] rows.
    g = g_ref[0, 0]        # rows: 0-2 g_rgb, 3 g_depth, 4 g_alpha
    fwd = out8_ref[0, 0]   # rows: 0-2 rgb, 3 depth, 4 T_fin
    g4r = g[0:4, :]                # [4, PIX] (g_rgb | g_d)
    g_d = g[3:4, :]                # [1, PIX]
    g_t = g[4:5, :]                # [1, PIX] dL/dT_fin
    bg = bg_ref[0:3, 0:1]          # [3, 1]
    t_fin = fwd[4:5, :]            # [1, PIX]
    # B and TotalContrib from outputs (see module docstring).
    b_term = (jnp.sum(g[0:3, :] * bg, axis=0, keepdims=True)
              + DEPTH_EMPTY * g_d + g_t)                       # [1,PIX]
    total_contrib = (jnp.sum(g[0:3, :] * (fwd[0:3, :] - t_fin * bg),
                             axis=0, keepdims=True)
                     + g_d * (fwd[3:4, :] - DEPTH_EMPTY * t_fin))

    # Moments basis [PIX, 6]: {1, px, py, px^2, py^2, px*py} in LOCAL
    # coords, padded to 128 lanes by the dot itself.
    pxc = pxl.reshape(PIX, 1)
    pyc = pyl.reshape(PIX, 1)
    basis = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32), pxc, pyc, pxc * pxc, pyc * pyc,
         pxc * pyc], axis=1)                                   # [PIX, 6]

    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            attrs_ref.at[pl.ds(start + chunk_idx * CHUNK, CHUNK), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        i, t_carry, _ = state
        return jnp.logical_and(i < n_chunks, jnp.max(t_carry) >= T_STOP)

    def body(state):
        i, t_carry, prefix = state

        @pl.when(i + 1 < n_chunks)
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(i % 2, i).wait()
        a = scratch[i % 2]  # [CHUNK, NROWS]

        sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        valid = (i * CHUNK + sub) < count
        mxl = a[:, 0:1] - ox            # [CHUNK, 1] local means
        myl = a[:, 1:2] - oy
        ca, cb, cc = a[:, 2:3], a[:, 3:4], a[:, 4:5]
        dx = pxl - mxl                  # [CHUNK, PIX]
        dy = pyl - myl
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha_raw = a[:, 5:6] * jnp.exp(power)
        unclipped = alpha_raw < 0.99
        alpha = jnp.minimum(0.99, alpha_raw)
        live = (alpha >= ALPHA_MIN) & valid & (power <= 0.0)
        alpha = jnp.where(live, alpha, 0.0)
        logs = jnp.log1p(-alpha)
        # Exclusive prefix, matching the forward kernel's recompute.
        cum_ex = _splat_cumsum(logs, exclusive=True)
        t_in = t_carry * jnp.exp(cum_ex)
        t_out = t_in * (1.0 - alpha)
        contrib = t_out >= T_STOP
        w = jnp.where(contrib, alpha * t_in, 0.0)

        # A_i and running prefix of w_j A_j (inclusive).
        cd = a[:, 6:10]                                     # [CHUNK, 4]
        A = jax.lax.dot_general(
            cd, g4r, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # [CHUNK,PIX]
        wA = w * A
        prefix_i = prefix + _splat_cumsum(wA)               # inclusive
        suffix = total_contrib - prefix_i                   # [CHUNK,PIX]

        one_m = jnp.where(alpha < 1.0, 1.0 - alpha, 1.0)
        d_alpha = jnp.where(
            contrib & live,
            t_in * A - (suffix + t_fin * b_term) / one_m, 0.0)

        # alpha -> (opacity, power); clip gate.
        d_alpha_eff = jnp.where(unclipped, d_alpha, 0.0)
        d_power = d_alpha_eff * alpha            # alpha=op*exp(power)

        # ONE moments matmul replaces six per-channel pixel sums.
        mom = jax.lax.dot_general(
            d_power, basis, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # [CHUNK, 6]
        m0 = mom[:, 0:1]
        mx_, my_ = mom[:, 1:2], mom[:, 2:3]
        mxx, myy, mxy = mom[:, 3:4], mom[:, 4:5], mom[:, 5:6]
        cx = mx_ - mxl * m0             # Σ d_power·dx
        cy = my_ - myl * m0
        cxx = mxx - 2.0 * mxl * mx_ + mxl * mxl * m0   # Σ d_power·dx²
        cyy = myy - 2.0 * myl * my_ + myl * myl * m0
        cxy = mxy - mxl * my_ - myl * mx_ + mxl * myl * m0
        d_a = -0.5 * cxx
        d_b = -cxy
        d_c = -0.5 * cyy
        # power depends on means via dx = px - mx:
        # dpower/dmx = a dx + b dy ; dpower/dmy = c dy + b dx
        d_mx = ca * cx + cb * cy
        d_my = cc * cy + cb * cx
        # d_op = d_power / op wherever nonzero (exactly 0 elsewhere).
        d_opacity = m0 / jnp.maximum(a[:, 5:6], 1e-20)

        # color/depth grads: w @ g4^T -> [CHUNK, 4]; the g4 hi/lo split
        # terms ride separate SUBLANES of one packed operand (2 passes).
        whi = w.astype(jnp.bfloat16)
        wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        g4hi = g4r.astype(jnp.bfloat16)
        g4lo = (g4r - g4hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g48 = jnp.concatenate([g4hi, g4lo], axis=0)     # [8, PIX]

        def wdot(u, v):  # [CHUNK,PIX] x [k,PIX] -> [CHUNK,k]
            return jax.lax.dot_general(
                u, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        wg8 = wdot(whi, g48)
        wg = wg8[:, 0:4] + wg8[:, 4:8] + wdot(wlo, g4hi)

        grow = jnp.concatenate([
            d_mx, d_my, d_a, d_b, d_c, d_opacity, wg,
            jnp.zeros((CHUNK, NROWS - 10), jnp.float32)],
            axis=1)  # [CHUNK, NROWS]
        gscratch[:, :] = grow
        cp = pltpu.make_async_copy(
            gscratch,
            gout_ref.at[pl.ds(start + i * CHUNK, CHUNK), :],
            gsem)
        cp.start()
        cp.wait()

        t_next = t_carry * jnp.exp(
            jnp.sum(jnp.where(contrib, logs, 0.0), axis=0, keepdims=True))
        prefix_next = prefix + jnp.sum(wA, axis=0, keepdims=True)
        return i + 1, t_next, prefix_next

    init = (jnp.int32(0), jnp.ones((1, PIX), jnp.float32),
            jnp.zeros((1, PIX), jnp.float32))
    i_stop, _, _ = jax.lax.while_loop(cond, body, init)

    # Early-exit leaves later chunks (and their aligned padding) unwritten
    # in the ANY-space output — zero-fill so the downstream segment
    # reduction sees clean zeros. Also retires the dangling early-exit
    # DMA via the shared semaphore order (its slot is never reused here).
    @pl.when(i_stop < n_chunks)
    def _():
        get_dma(i_stop % 2, i_stop).wait()

    def zero_fill(i, _):
        gscratch[:, :] = jnp.zeros((CHUNK, NROWS), jnp.float32)
        cp = pltpu.make_async_copy(
            gscratch,
            gout_ref.at[pl.ds(start + i * CHUNK, CHUNK), :],
            gsem)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(i_stop, n_chunks, zero_fill, 0)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "interpret"))
def composite_pallas_bwd(attrs: jnp.ndarray, seg_start: jnp.ndarray,
                         counts: jnp.ndarray, bg_color: jnp.ndarray,
                         tiles8: jnp.ndarray, g_tiles8: jnp.ndarray,
                         tiles_x: int, tiles_y: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Returns d(attrs) [P_aligned, NROWS].

    tiles8 / g_tiles8: forward outputs and their upstream grads,
    [num_tiles, 8, PIX] (rows 0-2 rgb, 3 depth, 4 final-T / alpha grads —
    caller converts d(alpha_out) into row 4 with the proper sign).
    """
    p_aligned = attrs.shape[0]
    bg = jnp.zeros((8, 1), jnp.float32).at[0:3, 0].set(bg_color)
    t8 = tiles8.reshape(tiles_y, tiles_x, 8, PIX)
    g8 = g_tiles8.reshape(tiles_y, tiles_x, 8, PIX)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # attrs (HBM)
            pl.BlockSpec((1, 1, 8, PIX), lambda t, tx, *_: (t, tx, 0, 0),
                         memory_space=pltpu.VMEM),  # upstream grads
            pl.BlockSpec((1, 1, 8, PIX), lambda t, tx, *_: (t, tx, 0, 0),
                         memory_space=pltpu.VMEM),  # forward outputs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, NROWS), jnp.float32),
            pltpu.VMEM((CHUNK, NROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    grads = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((p_aligned, NROWS), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), attrs,
      g8, t8, bg)
    return grads
