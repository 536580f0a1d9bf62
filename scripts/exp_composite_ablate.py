"""EXPERIMENT: composite-kernel op-block cost map on real hardware.

Variants of the fused compositing kernel with individual op blocks
stubbed out (or restructured), timed in isolation on the 1080p bench
inputs. Decides where the round-3 kernel work should go:

  base      current kernel rebuilt here (sanity vs the module's timing)
  nopower   quadratic form replaced by a constant     (power-block cost)
  noexp     exp(power) dropped                        (exp cost)
  nolog     log1p dropped                             (log1p cost)
  noexpcum  exp(prefix) dropped                       (2nd exp cost)
  nocum     prefix tri-matmuls dropped                (MXU prefix cost)
  mxupower  power+log(op) as a [PIX,12]@[12,CHUNK] basis matmul
            (measured: LOSES 2.8 ms — k=12 matmul serializes with the
            prefix matmuls)
  power7    fma-restructured power: u=qxx*dx+qxy*dy; p=u*dx+(qyy*dy)*dy
            with per-chunk negated conic rows (7 ops vs 10)
  pipelined REAL candidate: software-pipelined chunk loop — chunk i+1's
            carry-independent front (power/alpha/logs/prefix matmul)
            computed in body(i) so the MXU prefix matmul overlaps chunk
            i's carry-dependent VPU tail (exp/t_in/w/color matmul)
  pipe7     pipelined + power7

Values are wrong for the stubs (timing only); mxupower is numerically
real and also reports max|rgb - base_rgb|.

    python -u scripts/exp_composite_ablate.py [variants...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

INTERPRET = os.environ.get("EXP_INTERPRET") == "1"  # CPU smoke mode
if INTERPRET:
    import jax

    jax.config.update("jax_platforms", "cpu")


def _timeit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def make_kernel(variant, group, tiles_x, tiles_y, tile_h, tile_w):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multiview_inpaint_tpu.ops.rasterizer.composite import (DEPTH_EMPTY,
                                                                T_STOP)
    from multiview_inpaint_tpu.ops.rasterizer.pallas_composite import (
        CHUNK, NROWS, _lane_cumsum)

    def _kernel(starts_ref, counts_ref, attrs_ref, bg_ref, out_ref,
                scratch, sems):
        pix = tile_h * tile_w
        t = pl.program_id(0)
        txg = pl.program_id(1)

        def win_base(row):
            return pl.multiple_of((starts_ref[row] // CHUNK) * CHUNK,
                                  CHUNK)

        def issue_chunk0(row, slot):
            @pl.when(counts_ref[row] > 0)
            def _():
                pltpu.make_async_copy(
                    attrs_ref.at[:, pl.ds(win_base(row), CHUNK)],
                    scratch.at[slot], sems.at[slot]).start()

        @pl.when(jnp.logical_and(t == 0, txg == 0))
        def _():
            issue_chunk0(0, 0)

        # Hoisted tile-local pixel coords: identical for every tile of
        # the group (the iota+mod+div chain measured ~1.4 ms/frame when
        # rebuilt per tile).
        lin_h = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
        pxl_h = jnp.mod(lin_h, tile_w).astype(jnp.float32)
        pyl_h = (lin_h // tile_w).astype(jnp.float32)

        def one_tile_hoist(g, _):
            tx = txg * group + g
            ox = (tx * tile_w).astype(jnp.float32)
            oy = (t * tile_h).astype(jnp.float32)
            px = pxl_h + ox
            py = pyl_h + oy
            row = t * tiles_x + tx
            start = win_base(row)
            off = starts_ref[row] - start
            count = counts_ref[row]
            seg_end = off + count
            n_chunks = jnp.where(count > 0, pl.cdiv(seg_end, CHUNK), 0)
            base = (row % 2) * 2

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    attrs_ref.at[:, pl.ds(start + chunk_idx * CHUNK,
                                          CHUNK)],
                    scratch.at[slot], sems.at[slot])

            @pl.when(row + 1 < tiles_x * tiles_y)
            def _():
                issue_chunk0(row + 1, ((row + 1) % 2) * 2)

            def cond(state):
                i, t_carry = state[0], state[1]
                if variant == "hoistnoexit":
                    return i < n_chunks
                return jnp.logical_and(i < n_chunks,
                                       jnp.max(t_carry) >= T_STOP)

            def body(state):
                i, t_carry, acc4, = state

                @pl.when(i + 1 < n_chunks)
                def _():
                    get_dma(base + (i + 1) % 2, i + 1).start()

                get_dma(base + i % 2, i).wait()
                a = scratch[base + i % 2]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                sl = i * CHUNK + lane
                valid = (sl >= off) & (sl < seg_end)
                dx = px - a[0:1, :]
                dy = py - a[1:2, :]
                qxx = -0.5 * a[2:3, :]
                qxy = -a[3:4, :]
                qyy = -0.5 * a[4:5, :]
                u = qxx * dx + qxy * dy
                power = u * dx + (qyy * dy) * dy
                alpha = jnp.minimum(0.99, a[5:6, :] * jnp.exp(power))
                alpha = jnp.where(
                    (alpha >= a[10:11, :]) & valid & (power <= 0.0),
                    alpha, 0.0)
                logs = jnp.log1p(-alpha)
                cum_ex = _lane_cumsum(logs, exclusive=True)
                t_in = t_carry * jnp.exp(cum_ex)
                t_out = t_in * (1.0 - alpha)
                contrib = t_out >= T_STOP
                w = jnp.where(contrib, alpha * t_in, 0.0)
                cd = jnp.concatenate([a[6:9, :], a[9:10, :]], axis=0).T
                whi = w.astype(jnp.bfloat16)
                wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                cdb = cd.astype(jnp.bfloat16)
                cdl = (cd - cdb.astype(jnp.float32)).astype(jnp.bfloat16)
                acc4 = acc4 + (
                    jax.lax.dot_general(
                        whi, cdb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        wlo, cdb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        whi, cdl, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                t_next = t_carry * jnp.exp(
                    jnp.sum(jnp.where(contrib, logs, 0.0), axis=1,
                            keepdims=True))
                return i + 1, t_next, acc4

            init = (jnp.int32(0), jnp.ones((pix, 1), jnp.float32),
                    jnp.zeros((pix, 4), jnp.float32))
            i_end, t_fin, acc4 = jax.lax.while_loop(cond, body, init)

            @pl.when(i_end < n_chunks)
            def _():
                get_dma(base + i_end % 2, i_end).wait()

            bgd = bg_ref[0:4, 0]  # rows 0-2 bg rgb, row 3 = DEPTH_EMPTY
            rgbd = acc4 + t_fin * bgd[None, :]          # [pix, 4]
            if variant == "outpix8":
                out_ref[0, g, :, 0:4] = rgbd
                out_ref[0, g, :, 4:5] = t_fin
            else:
                out = jnp.concatenate(
                    [rgbd, t_fin, jnp.zeros((pix, 3), jnp.float32)],
                    axis=1)
                out_ref[0, g] = out.T
            return 0

        def one_tile_pipelined(g, _):
            tx = txg * group + g
            lin = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
            px = (tx * tile_w + jnp.mod(lin, tile_w)).astype(jnp.float32)
            py = (t * tile_h + lin // tile_w).astype(jnp.float32)
            row = t * tiles_x + tx
            start = win_base(row)
            off = starts_ref[row] - start
            count = counts_ref[row]
            seg_end = off + count
            n_chunks = jnp.where(count > 0, pl.cdiv(seg_end, CHUNK), 0)
            base = (row % 2) * 2

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    attrs_ref.at[:, pl.ds(start + chunk_idx * CHUNK,
                                          CHUNK)],
                    scratch.at[slot], sems.at[slot])

            @pl.when(row + 1 < tiles_x * tiles_y)
            def _():
                issue_chunk0(row + 1, ((row + 1) % 2) * 2)

            def front(i):
                """Carry-independent work of chunk i (reads its slot)."""
                a = scratch[base + i % 2]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                sl = i * CHUNK + lane
                valid = (sl >= off) & (sl < seg_end)
                if variant == "pipe7":
                    dx = px - a[0:1, :]
                    dy = py - a[1:2, :]
                    qxx = -0.5 * a[2:3, :]
                    qxy = -a[3:4, :]
                    qyy = -0.5 * a[4:5, :]
                    u = qxx * dx + qxy * dy
                    power = u * dx + (qyy * dy) * dy
                else:
                    dx = px - a[0:1, :]
                    dy = py - a[1:2, :]
                    power = (-0.5 * (a[2:3, :] * dx * dx
                                     + a[4:5, :] * dy * dy)
                             - a[3:4, :] * dx * dy)
                alpha = jnp.minimum(0.99, a[5:6, :] * jnp.exp(power))
                alpha = jnp.where(
                    (alpha >= a[10:11, :]) & valid & (power <= 0.0),
                    alpha, 0.0)
                logs = jnp.log1p(-alpha)
                cum_ex = _lane_cumsum(logs, exclusive=True)
                cd = jnp.concatenate([a[6:9, :], a[9:10, :]], axis=0)
                return alpha, logs, cum_ex, cd

            @pl.when(n_chunks > 0)
            def _():
                get_dma(base + 0, 0).wait()
            f0 = front(0)  # garbage when n_chunks == 0; never consumed

            @pl.when(n_chunks > 1)
            def _():
                get_dma(base + 1, 1).start()

            def cond(state):
                i, t_carry = state[0], state[1]
                return jnp.logical_and(i < n_chunks,
                                       jnp.max(t_carry) >= T_STOP)

            def body(state):
                (i, t_carry, rgb_acc, d_acc,
                 alpha_c, logs_c, cum_c, cd_c) = state

                @pl.when(i + 2 < n_chunks)
                def _():
                    get_dma(base + i % 2, i + 2).start()

                @pl.when(i + 1 < n_chunks)
                def _():
                    get_dma(base + (i + 1) % 2, i + 1).wait()
                alpha_n, logs_n, cum_n, cd_n = front(i + 1)

                t_in = t_carry * jnp.exp(cum_c)
                t_out = t_in * (1.0 - alpha_c)
                contrib = t_out >= T_STOP
                w = jnp.where(contrib, alpha_c * t_in, 0.0)
                cdt = cd_c.T
                whi = w.astype(jnp.bfloat16)
                wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                cdb = cdt.astype(jnp.bfloat16)
                cdl = (cdt - cdb.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = (jax.lax.dot_general(
                           whi, cdb, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           wlo, cdb, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           whi, cdl, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32))
                rgb_acc = rgb_acc + acc[:, :3]
                d_acc = d_acc + acc[:, 3:4]
                t_next = t_carry * jnp.exp(
                    jnp.sum(jnp.where(contrib, logs_c, 0.0), axis=1,
                            keepdims=True))
                return (i + 1, t_next, rgb_acc, d_acc,
                        alpha_n, logs_n, cum_n, cd_n)

            init = (jnp.int32(0), jnp.ones((pix, 1), jnp.float32),
                    jnp.zeros((pix, 3), jnp.float32),
                    jnp.zeros((pix, 1), jnp.float32)) + f0
            out_state = jax.lax.while_loop(cond, body, init)
            i_end, t_fin, rgb_acc, d_acc = out_state[:4]

            @pl.when(i_end + 1 < n_chunks)
            def _():
                get_dma(base + (i_end + 1) % 2, i_end + 1).wait()

            bg = bg_ref[0:3, 0]
            rgb = rgb_acc + t_fin * bg[None, :]
            dep = d_acc + t_fin * DEPTH_EMPTY
            out = jnp.concatenate(
                [rgb, dep, t_fin, jnp.zeros((pix, 3), jnp.float32)],
                axis=1)
            out_ref[0, g] = out.T
            return 0

        def one_tile(g, _):
            tx = txg * group + g
            if variant == "noiota":
                pxl = pyl = jnp.full((pix, 1), 3.0, jnp.float32)
            else:
                lin = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
                pxl = jnp.mod(lin, tile_w).astype(jnp.float32)
                pyl = (lin // tile_w).astype(jnp.float32)
            ox = (tx * tile_w).astype(jnp.float32)
            oy = (t * tile_h).astype(jnp.float32)
            px = pxl + ox
            py = pyl + oy
            if variant == "mxupower":
                # [pix, 12] bf16 basis (local coords, int-exact): the
                # hi|lo coefficient stacking duplicates the 6 columns.
                b6 = jnp.concatenate(
                    [pxl * pxl, pyl * pyl, pxl * pyl, pxl, pyl,
                     jnp.ones((pix, 1), jnp.float32)],
                    axis=1).astype(jnp.bfloat16)
                basis = jnp.concatenate([b6, b6], axis=1)  # [pix, 12]

            row = t * tiles_x + tx
            start = win_base(row)
            off = starts_ref[row] - start
            count = counts_ref[row]
            seg_end = off + count
            n_chunks = jnp.where(count > 0, pl.cdiv(seg_end, CHUNK), 0)
            base = (row % 2) * 2

            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    attrs_ref.at[:, pl.ds(start + chunk_idx * CHUNK,
                                          CHUNK)],
                    scratch.at[slot], sems.at[slot])

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
                a = scratch[base + i % 2]

                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                sl = i * CHUNK + lane
                valid = (sl >= off) & (sl < seg_end)

                if variant == "power7":
                    dx = px - a[0:1, :]
                    dy = py - a[1:2, :]
                    qxx = -0.5 * a[2:3, :]
                    qxy = -a[3:4, :]
                    qyy = -0.5 * a[4:5, :]
                    u = qxx * dx + qxy * dy
                    power = u * dx + (qyy * dy) * dy
                    alpha = jnp.minimum(0.99, a[5:6, :] * jnp.exp(power))
                    alpha = jnp.where(
                        (alpha >= a[10:11, :]) & valid & (power <= 0.0),
                        alpha, 0.0)
                elif variant == "mxupower":
                    mxl = a[0:1, :] - ox
                    myl = a[1:2, :] - oy
                    qxx = -0.5 * a[2:3, :]
                    qxy = -a[3:4, :]
                    qyy = -0.5 * a[4:5, :]
                    logop = jnp.log(jnp.maximum(a[5:6, :], 1e-30))
                    c3 = -(2.0 * qxx * mxl + qxy * myl)
                    c4 = -(2.0 * qyy * myl + qxy * mxl)
                    c5 = (qxx * mxl * mxl + qxy * mxl * myl
                          + qyy * myl * myl + logop)
                    cf = jnp.concatenate([qxx, qyy, qxy, c3, c4, c5],
                                         axis=0)          # [6, CHUNK]
                    chi = cf.astype(jnp.bfloat16)
                    clo = (cf - chi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    c12 = jnp.concatenate([chi, clo], axis=0)
                    s = jax.lax.dot_general(
                        basis, c12, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [pix,CHUNK]
                    alpha = jnp.minimum(0.99, jnp.exp(s))
                    lgate = jnp.log(jnp.maximum(a[10:11, :], 1e-30))
                    alpha = jnp.where(
                        (s >= lgate) & valid & (s <= logop + 3e-2),
                        alpha, 0.0)
                else:
                    if variant == "nopower":
                        power = a[2:3, :] * 1e-9 - 0.5
                    else:
                        dx = px - a[0:1, :]
                        dy = py - a[1:2, :]
                        power = (-0.5 * (a[2:3, :] * dx * dx
                                         + a[4:5, :] * dy * dy)
                                 - a[3:4, :] * dx * dy)
                    if variant == "noexp":
                        alpha = jnp.minimum(0.99,
                                            a[5:6, :] + power * 1e-9)
                    else:
                        alpha = jnp.minimum(0.99,
                                            a[5:6, :] * jnp.exp(power))
                    alpha = jnp.where(
                        (alpha >= a[10:11, :]) & valid & (power <= 0.0),
                        alpha, 0.0)
                if variant == "nolog":
                    logs = -alpha
                else:
                    logs = jnp.log1p(-alpha)
                if variant == "nocum":
                    cum_ex = logs * 0.5
                else:
                    cum_ex = _lane_cumsum(logs, exclusive=True)
                if variant == "noexpcum":
                    t_in = t_carry * (1.0 + cum_ex * 1e-9)
                else:
                    t_in = t_carry * jnp.exp(cum_ex)
                t_out = t_in * (1.0 - alpha)
                contrib = t_out >= T_STOP
                w = jnp.where(contrib, alpha * t_in, 0.0)

                cd = jnp.concatenate([a[6:9, :], a[9:10, :]], axis=0).T
                whi = w.astype(jnp.bfloat16)
                wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                cdb = cd.astype(jnp.bfloat16)
                cdl = (cd - cdb.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = (jax.lax.dot_general(
                           whi, cdb, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           wlo, cdb, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
                       + jax.lax.dot_general(
                           whi, cdl, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32))
                rgb_acc = rgb_acc + acc[:, :3]
                d_acc = d_acc + acc[:, 3:4]
                t_next = t_carry * jnp.exp(
                    jnp.sum(jnp.where(contrib, logs, 0.0), axis=1,
                            keepdims=True))
                return i + 1, t_next, rgb_acc, d_acc

            init = (jnp.int32(0), jnp.ones((pix, 1), jnp.float32),
                    jnp.zeros((pix, 3), jnp.float32),
                    jnp.zeros((pix, 1), jnp.float32))
            if variant == "nowhile":  # no saturation early-exit
                i_end, t_fin, rgb_acc, d_acc = jax.lax.while_loop(
                    lambda s: s[0] < n_chunks, body, init)
            else:
                i_end, t_fin, rgb_acc, d_acc = jax.lax.while_loop(
                    cond, body, init)

            @pl.when(i_end < n_chunks)
            def _():
                get_dma(base + i_end % 2, i_end).wait()

            if variant == "noepi":
                out_ref[0, g] = jnp.full((8, pix), 0.25, jnp.float32) \
                    * t_fin[0, 0]
            else:
                bg = bg_ref[0:3, 0]
                rgb = rgb_acc + t_fin * bg[None, :]
                dep = d_acc + t_fin * DEPTH_EMPTY
                out = jnp.concatenate(
                    [rgb, dep, t_fin, jnp.zeros((pix, 3), jnp.float32)],
                    axis=1)
                out_ref[0, g] = out.T
            return 0

        if variant in ("pipelined", "pipe7"):
            jax.lax.fori_loop(0, group, one_tile_pipelined, 0)
        elif variant in ("hoist", "hoistnoexit", "outpix8"):
            jax.lax.fori_loop(0, group, one_tile_hoist, 0)
        else:
            jax.lax.fori_loop(0, group, one_tile, 0)

    return _kernel


def composite_variant(variant, attrs_t, seg_start, counts, bg_color,
                      tiles_x, tiles_y, tile_h=16, tile_w=16):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multiview_inpaint_tpu.ops.rasterizer.pallas_composite import (
        CHUNK, NROWS)

    from multiview_inpaint_tpu.ops.rasterizer.composite import DEPTH_EMPTY

    pix = tile_h * tile_w
    group = 8
    bg = jnp.zeros((8, 1), jnp.float32).at[0:3, 0].set(bg_color)
    bg = bg.at[3, 0].set(DEPTH_EMPTY)
    if variant == "outpix8":
        out_specs = pl.BlockSpec((1, group, pix, 8),
                                 lambda t, txg, *_: (t, txg, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((tiles_y, tiles_x, pix, 8),
                                         jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, group, 8, pix),
                                 lambda t, txg, *_: (t, txg, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((tiles_y, tiles_x, 8, pix),
                                         jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x // group),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((4, NROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(variant, group, tiles_x, tiles_y, tile_h, tile_w),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), attrs_t, bg)
    if variant == "outpix8":
        return out.reshape(tiles_x * tiles_y, pix, 8)
    return out.reshape(tiles_x * tiles_y, 8, pix)


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera, binning,
                                                      geometry,
                                                      pallas_composite,
                                                      segment_reduce)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    variants = sys.argv[1:] or ["base", "nopower", "noexp", "nolog",
                                "noexpcum", "nocum", "mxupower"]

    n = 2_000 if INTERPRET else 100_000
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = rng.uniform(0.3, 1.0, n) ** (1 / 3)
    xyz = np.stack([r * np.sin(phi) * np.cos(theta),
                    r * np.sin(phi) * np.sin(theta),
                    r * np.cos(phi)], -1).astype(np.float32)
    rgb = (xyz * 0.5 + 0.5).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    params = gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.8)))),
        np.log(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32)),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    width, height = (384, 256) if INTERPRET else (1920, 1080)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=width, height=height)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    PB = 13 * n
    tiles_x, tiles_y = -(-width // 16), -(-height // 16)
    CHUNK = pallas_composite.CHUNK

    proj = geometry.project_gaussians(
        params.xyz, params.features(), params.act_opacity()[:, 0],
        params.act_scaling(), params.act_rotation(), params.live,
        rcam.world_view, rcam.full_proj, rcam.campos, rcam.tan_fovx,
        rcam.tan_fovy, rcam.width, rcam.height, 0, 1.0, None)
    packed = pallas_composite.pack_attrs(
        proj.means2d, proj.conic, proj.opacity, proj.color, proj.depth)
    bins = binning.bin_gaussians(
        proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
        16, 16, PB, 1024, gather_ids=False, aligned_chunk=CHUNK,
        extent=proj.extent, expand_kernel=True, aux=packed,
        interpret=INTERPRET)
    pk = jnp.concatenate(
        [bins.aux_sorted, jnp.zeros((1, bins.aux_sorted.shape[1]))])
    attrs_t = segment_reduce.gather_pairs(pk, bins.gid_sorted,
                                          bins.rank_lo).T
    attrs_t = jax.block_until_ready(attrs_t)
    print(f"pairs={int(bins.total_pairs)}", flush=True)

    base_rgb = None
    for v in variants:
        fn = jax.jit(functools.partial(composite_variant, v),
                     static_argnames=("tiles_x", "tiles_y"))
        t0 = time.perf_counter()
        try:
            dt, out = _timeit(
                lambda: fn(attrs_t, bins.seg_start, bins.counts, bg,
                           tiles_x=tiles_x, tiles_y=tiles_y))
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        note = ""
        if v == "base":
            base_rgb = np.asarray(out[:, 0:3, :])
        elif v in ("mxupower", "pipelined", "pipe7", "power7", "hoist",
                   "hoistnoexit", "outpix8") and base_rgb is not None:
            got = (np.moveaxis(np.asarray(out[:, :, 0:3]), 2, 1)
                   if v == "outpix8" else np.asarray(out[:, 0:3, :]))
            err = float(np.abs(got - base_rgb).max())
            note = f" maxerr={err:.2e}"
        dt_c = time.perf_counter() - t0
        print(f"{v}: {dt*1e3:.2f} ms (compile {dt_c:.0f}s){note}",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
