"""Fused Pallas compositing kernel — the hot path of the rasterizer.

Where the XLA path (``composite.py``) materializes [tiles, pixels, chunk]
alpha tensors in HBM and pays the full per-tile splat budget everywhere,
this kernel:

- streams each tile's splats straight from a **pair-sorted attribute
  array** ``attrs [16, P]`` in HBM (one XLA gather builds it; tiles own
  contiguous slices, like the CUDA design's sorted key ranges),
- loops over 128-splat chunks with a ``while_loop`` that **exits early**
  when the tile's transmittance saturates (max over pixels < 1e-4) or the
  segment is exhausted — empty tiles do zero compute,
- keeps every intermediate in VMEM ([256 px, 128 splat] blocks), with the
  color/depth accumulation hitting the MXU as a [256,128]x[128,4] matmul,
- double-buffers the chunk DMA so the next chunk loads while the current
  one composites.

Packed attribute rows (sublane dim): 0 mean_x, 1 mean_y, 2 conic_a,
3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b, 9 depth, 10 alpha-gate
(the per-splat ellipse cutoff — see composite.alpha_gate), 11-15 pad.
(A 10-row layout was tried: Mosaic requires sublane slice sizes to be
multiples of the (8,128) tiling, so 10-row chunk DMAs do not compile,
and the measured gather is per-row-overhead-bound — narrower rows only
bought ~8%. 16 rows stand.)
Output per tile: [8, 256] = rows (r, g, b, depth, final_T, pad...).

Forward-only: gradients route through the XLA path via ``jax.custom_vjp``
(recompute) — see ``api.render(backend=...)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import DEPTH_EMPTY, T_STOP, alpha_gate

TILE_H = 16   # default tile shape; composite_pallas accepts (8, 16)
TILE_W = 16   # too (PIX = tile_h*tile_w must be a multiple of 128)
PIX = TILE_H * TILE_W  # 256
CHUNK = 128
NROWS = 16  # packed attribute rows (see layout above)


def _lane_cumsum(x, exclusive: bool = False):
    """Cumsum along the lane (last) axis of a [.., CHUNK] block, as a
    triangular-ones MXU matmul (no cumsum primitive in Mosaic);
    ``exclusive`` uses the strictly-lower triangle. The operand rides as
    a manual hi/lo bf16 split — two single-pass bf16 matmuls with f32
    accumulation reach ~2^-16 relative accuracy at 1/3 the cost of
    Precision.HIGHEST (Mosaic supports neither HIGH nor f32-input dots
    without full passes); a Hillis-Steele rotate-scan on the VPU
    measured *slower* than the MXU matmul on v5e (22.6 vs 18.3 ms for
    the 1080p composite). The ones matrix is exact in bf16, so only x
    is split."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = ((rows < cols) if exclusive else (rows <= cols)).astype(
        jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(v):
        return jax.lax.dot_general(
            v, tri, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return dot(hi) + dot(lo)


def _kernel(group, tiles_x, tiles_y, tile_h, tile_w, early_exit, variant,
            starts_ref, counts_ref, row0_ref, attrs_ref, bg_ref, out_ref,
            scratch, sems):
    pix = tile_h * tile_w
    t = pl.program_id(0)
    txg = pl.program_id(1)

    def win_base(row):
        # Segments are UNALIGNED (no padding pairs in the sorted layout);
        # DMA from the 128-aligned enclosing window — Mosaic needs a
        # provably lane-aligned offset, which floor128 + multiple_of is —
        # and mask the out-of-segment lanes in compute.
        return pl.multiple_of((starts_ref[row] // CHUNK) * CHUNK, CHUNK)

    def issue_chunk0(row, slot):
        # Prefetch a tile's first chunk while its predecessor composites:
        # with ~1.6 chunks per tile the first-chunk DMA latency would
        # otherwise be exposed on almost every tile.
        @pl.when(counts_ref[row] > 0)
        def _():
            pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(win_base(row), CHUNK)],
                scratch.at[slot], sems.at[slot]).start()

    @pl.when(jnp.logical_and(t == 0, txg == 0))
    def _():
        issue_chunk0(0, 0)

    # Tile-LOCAL pixel coords hoisted out of the group loop: identical
    # for every tile, and the iota+mod+div chain rebuilt per tile
    # measured 1.4 ms/frame at 1080p (ablation, PERF.md round 3).
    lin = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    pxl = jnp.mod(lin, tile_w).astype(jnp.float32)
    pyl = (lin // tile_w).astype(jnp.float32)
    if variant == "mxu_power":
        # [pix, 8] monomial operand for the quadratic-form matmul: all
        # entries are integers <= (tile_w-1)*(tile_h-1) = 225 — exactly
        # representable in bf16.
        monos = jnp.concatenate(
            [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl,
             jnp.ones_like(pxl), jnp.zeros_like(pxl),
             jnp.zeros_like(pxl)], axis=1).astype(jnp.bfloat16)
    else:
        monos = None

    # Empty-tile fast path (hoisted): zero accumulators, T = 1. Half the
    # bench scene's tiles are empty, and running them through the normal
    # epilogue (a [pix,4]/[pix,1] concat + transpose — ~96 lane-padded
    # vreg ops) measured ~0.25 us/tile = 2.0 ms/frame at 1080p for pure
    # overhead; this constant store is ~10x cheaper.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (8, pix), 0)
    empty_out = jnp.where(row_idx == 4, 1.0, 0.0)

    def one_tile(g, _):
        tx = txg * group + g
        # Tile-LOCAL coordinates: dx = pxl - (mx - ox) shifts the
        # [1,CHUNK] attr row by the origin instead of building [pix,1]
        # global pixel columns (narrow values occupy 32 lane-padded
        # vregs, so those two adds cost ~64 vreg-ops per tile).
        ox = (tx * tile_w).astype(jnp.float32)
        # Band mode (single-frame multi-chip sharding): local tile row t
        # maps to GLOBAL frame row row0 + t*stride — (0, 1) for whole
        # frames, (d, D) for interleaved bands — so dy below bit-matches
        # the full-frame kernel.
        oy = ((row0_ref[0] + t * row0_ref[1]) * tile_h).astype(
            jnp.float32)

        row = t * tiles_x + tx
        start = win_base(row)
        off = starts_ref[row] - start          # in-window lane offset
        count = counts_ref[row]
        seg_end = off + count
        # Empty tiles MUST run zero chunks: cdiv(off, CHUNK) is 1 when
        # an empty tile's start is unaligned, and its chunk-0 DMA is
        # never issued (issue_chunk0 guards on count > 0) — waiting on
        # that never-signaled semaphore deadlocks the device (found on
        # hardware; interpret mode's synchronous DMAs can't catch it).
        n_chunks = jnp.where(count > 0, pl.cdiv(seg_end, CHUNK), 0)
        # Consecutive tiles (incl. across grid steps) alternate scratch
        # slot pairs, keyed on global row parity.
        base = (row % 2) * 2

        def get_dma(slot, chunk_idx):
            return pltpu.make_async_copy(
                attrs_ref.at[:, pl.ds(start + chunk_idx * CHUNK, CHUNK)],
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

        def _composite_tile():
            log_stop = jnp.log(jnp.float32(T_STOP))

            def cond(state):
                i, lt_carry, _ = state
                if not early_exit:
                    # The saturation check costs more than it saves on
                    # short-segment scenes: the per-chunk [pix,1] max +
                    # vector->scalar sync in a data-dependent loop bound
                    # measured 1.3-1.5 ms/frame at 1080p (avg 1.2 chunks
                    # per tile — the exit almost never fires before the
                    # segment ends). Output is identical either way: the
                    # contrib gate inside the body already zeroes
                    # saturated contributions.
                    return i < n_chunks
                return jnp.logical_and(i < n_chunks,
                                       jnp.max(lt_carry) >= log_stop)

            def body(state):
                # The transmittance carry rides in LOG space: folding it
                # into the prefix exp (exp(cum + lt)) deletes a [pix,1] exp
                # + two muls per chunk — [pix,1] values occupy 32 lane-
                # padded vregs, so narrow ops cost like full-width ones.
                i, lt_carry, acc4 = state

                @pl.when(i + 1 < n_chunks)
                def _():
                    get_dma(base + (i + 1) % 2, i + 1).start()

                get_dma(base + i % 2, i).wait()
                a = scratch[base + i % 2]  # [NROWS, CHUNK]

                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                sl = i * CHUNK + lane               # in-window slot [1,CHUNK]
                valid = (sl >= off) & (sl < seg_end)

                qxx = -0.5 * a[2:3, :]
                qxy = -a[3:4, :]
                qyy = -0.5 * a[4:5, :]
                if variant == "mxu_power":
                    # VERDICT r4 #4a experiment: the quadratic form as
                    # ONE monomial matmul [pix, 8] @ [8, CHUNK] — moves
                    # ~9 full-width VPU ops to the MXU (which overlaps
                    # the VPU critical path; comp_vpu_frac ~1.25).
                    # Monomials (x2, xy, y2, x, y, 1, 0, 0) over
                    # tile-LOCAL coords are integers <= 225 — exact in
                    # bf16; the coefficient rows carry the cancellation
                    # (|q·mx^2| up to ~1e2-1e3 vs power ~O(10)), so
                    # they ride a hi/lo split: rel error ~2^-16 *
                    # amplification — measured, not assumed.
                    mx = a[0:1, :] - ox          # [1, CHUNK] local mean
                    my = a[1:2, :] - oy
                    q3 = -(2.0 * qxx * mx + qxy * my)
                    q4 = -(2.0 * qyy * my + qxy * mx)
                    q5 = (qxx * mx + qxy * my) * mx + qyy * my * my
                    z = jnp.zeros_like(qxx)
                    qm = jnp.concatenate(
                        [qxx, qxy, qyy, q3, q4, q5, z, z], axis=0)
                    qhi = qm.astype(jnp.bfloat16)
                    qlo = (qm - qhi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    mono = monos  # [pix, 8] bf16, hoisted per tile

                    def pdot(v):
                        return jax.lax.dot_general(
                            mono, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    power = pdot(qhi) + pdot(qlo)
                    # The matmul form carries ~1e-3 abs error in power
                    # (coefficient cancellation at 2^-16); the exact
                    # `power <= 0` numerics gate flips at splat centers
                    # (power -> 0-, alpha large) and drops whole
                    # contributions. Clamp instead: exp(min(power,0))
                    # with a widened degenerate-conic gate.
                    gate_ok = power <= 0.5
                    power = jnp.minimum(power, 0.0)
                else:
                    dx = pxl - (a[0:1, :] - ox)  # [PIX, CHUNK]
                    dy = pyl - (a[1:2, :] - oy)
                    # fma-chain form of -0.5(ca dx^2 + cc dy^2) - cb
                    # dx dy: 7 [PIX,CHUNK] ops vs 10 (the negated conic
                    # rows are [1,CHUNK] — near-free).
                    u = qxx * dx + qxy * dy
                    power = u * dx + (qyy * dy) * dy
                    gate_ok = power <= 0.0
                alpha = jnp.minimum(0.99, a[5:6, :] * jnp.exp(power))
                alpha = jnp.where(
                    (alpha >= a[10:11, :]) & valid & gate_ok,
                    alpha, 0.0)
                logs = jnp.log1p(-alpha)
                # exclusive prefix -> T entering each splat directly; the
                # inclusive-prefix + divide variant measured 0.5 ms/frame
                # slower at 1080p (A/B, PERF.md)
                cum_ex = _lane_cumsum(logs, exclusive=True)
                t_in = jnp.exp(cum_ex + lt_carry)
                t_out = t_in * (1.0 - alpha)
                contrib = t_out >= T_STOP
                w = jnp.where(contrib, alpha * t_in, 0.0)  # [PIX, CHUNK]

                # [PIX, CHUNK] @ [CHUNK, 4] -> MXU. Manual 3-pass hi/lo
                # bf16 split: Precision.HIGHEST costs 6 full passes and
                # measured 1.3 ms/frame slower at 1080p (A/B, PERF.md);
                # the split keeps ~2^-16 relative accuracy. (Lane-packing
                # the hi/lo terms into one [CHUNK,8] operand measured
                # +1.9 ms: the [:, 0:4]/[:, 4:8] output slices sit at
                # unaligned lane offsets and force relayouts.)
                cd = jnp.concatenate([a[6:9, :], a[9:10, :]], axis=0).T
                whi = w.astype(jnp.bfloat16)
                cdb = cd.astype(jnp.bfloat16)
                if variant == "bf16_color":
                    # VERDICT r4 #4b experiment: single bf16 pass (drop
                    # the hi/lo splits — 2 of 3 MXU passes and ~4 VPU
                    # ops); rel error ~2^-8 on the accumulators,
                    # measured against the stated budget in
                    # exp_composite_variant.py.
                    acc4 = acc4 + jax.lax.dot_general(
                        whi, cdb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    wlo = (w - whi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    cdl = (cd - cdb.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    acc4 = acc4 + (jax.lax.dot_general(
                               whi, cdb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
                           + jax.lax.dot_general(
                               wlo, cdb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
                           + jax.lax.dot_general(
                               whi, cdl, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))
                # VPU lane reduce: an MXU ones-column dot here measured a
                # 4 ms/frame REGRESSION (small-N matmuls stall the pipe).
                lt_next = lt_carry + jnp.sum(
                    jnp.where(contrib, logs, 0.0), axis=1, keepdims=True)
                return i + 1, lt_next, acc4

            init = (jnp.int32(0), jnp.zeros((pix, 1), jnp.float32),
                    jnp.zeros((pix, 4), jnp.float32))
            i_end, lt_fin, acc4 = jax.lax.while_loop(cond, body, init)
            t_fin = jnp.exp(lt_fin)

            # Saturation exit leaves chunk i_end's DMA in flight (started in
            # body i_end-1). Retire it, or its stale semaphore signal would
            # let the tile two rows ahead read its slot mid-copy. (With
            # early_exit=False i_end == n_chunks and this is a no-op.)
            @pl.when(i_end < n_chunks)
            def _():
                get_dma(base + i_end % 2, i_end).wait()

            # RAW outputs (no background composite): rows 0-3 are the bare
            # rgb+depth accumulators, row 4 the final transmittance. The
            # caller composites `raw + T*[bg, DEPTH_EMPTY]` in XLA over the
            # dense [T,8,pix] output — doing it here cost ~96 lane-padded
            # vreg-ops per tile on [pix,4]/[pix,1] values, and the backward
            # kernel's TotalContrib/B terms get simpler with raw rows.
            out = jnp.concatenate(
                [acc4, t_fin, jnp.zeros((pix, 3), jnp.float32)], axis=1)
            out_ref[0, g] = out.T  # [8, pix]

        # Empty tiles skip the while_loop setup AND the narrow-value
        # epilogue entirely — a constant [8, pix] store instead (~10x
        # cheaper than the 0.25 us/tile the full epilogue measured; half
        # the 1080p bench scene's tiles are empty).
        @pl.when(count == 0)
        def _():
            out_ref[0, g] = empty_out

        @pl.when(count > 0)
        def _():
            _composite_tile()

        return 0

    jax.lax.fori_loop(0, group, one_tile, 0)


@partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_h",
                                   "tile_w", "interpret", "early_exit",
                                   "group", "variant"))
def composite_pallas(attrs_t: jnp.ndarray, seg_start: jnp.ndarray,
                     counts: jnp.ndarray, bg_color: jnp.ndarray,
                     tiles_x: int, tiles_y: int, tile_h: int = TILE_H,
                     tile_w: int = TILE_W, interpret: bool = False,
                     early_exit: bool = False, group: int = 0,
                     row0: jnp.ndarray | None = None,
                     variant: str = "base"):
    """attrs_t [NROWS, P] pair-sorted packed attrs; returns RAW
    [T, 8, pix] tiles (rows 0-3 = bg-free rgb+depth accumulators, row 4
    = final transmittance): callers composite the background in XLA.

    ``row0`` (traced int32, default (0, 1)): (offset, stride) mapping
    local tile row t to global frame row ``offset + t*stride`` — band
    mode for single-frame multi-chip sharding (contiguous bands stride
    1, interleaved bands stride D). The splat means stay in global
    pixel coordinates; the kernel shifts its per-tile origin so band
    output rows bit-match the full-frame render. A bare scalar means
    (offset, 1).

    ``early_exit`` enables the per-tile saturation break in the chunk
    loop. The OUTPUT is identical either way (the in-body contrib gate
    zeroes saturated splats); it is purely a perf knob — the check's
    vector->scalar sync costs ~1.4 ms/frame at 1080p where segments
    average ~1.2 chunks, and only pays off on deep-segment scenes.
    """
    pix = tile_h * tile_w
    assert pix % 128 == 0, "tile pixel count must be a lane multiple"
    num_tiles = tiles_x * tiles_y
    # Batch GROUP tiles per grid step: per-step launch overhead (~2 us)
    # dominates at 1 tile/step (8k steps at 1080p); the fori_loop
    # amortizes it 8x. GROUP must divide tiles_x.
    if group <= 0:
        group = next(g for g in (8, 6, 5, 4, 3, 2, 1)
                     if tiles_x % g == 0)
    assert tiles_x % group == 0, "group must divide tiles_x"
    bg = jnp.zeros((8, 1), jnp.float32).at[0:3, 0].set(bg_color)
    bg = bg.at[3, 0].set(DEPTH_EMPTY)
    row0_arr = _row_map_arr(row0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_y, tiles_x // group),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # attrs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec((1, group, 8, pix),
                               lambda t, txg, *_: (t, txg, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, NROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, group, tiles_x, tiles_y, tile_h, tile_w,
                early_exit, variant),
        out_shape=jax.ShapeDtypeStruct((tiles_y, tiles_x, 8, pix),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(num_tiles) * pix * CHUNK * 24,
            bytes_accessed=int(attrs_t.size) * 4 + num_tiles * pix * 32,
            transcendentals=int(num_tiles) * pix * CHUNK * 2,
        ),
    )(seg_start.astype(jnp.int32), counts.astype(jnp.int32), row0_arr,
      attrs_t, bg)
    return out.reshape(num_tiles, 8, pix)


def _row_map_arr(row0) -> jnp.ndarray:
    """(offset, stride) int32[2] scalar-prefetch operand; accepts None
    (identity), a bare offset scalar, or an (offset, stride) pair."""
    if row0 is None:
        return jnp.asarray([0, 1], jnp.int32)
    arr = jnp.asarray(row0, jnp.int32).reshape(-1)
    if arr.shape[0] == 1:
        arr = jnp.concatenate([arr, jnp.ones((1,), jnp.int32)])
    return arr


def pack_attrs(means2d, conic, opacity, color, depth) -> jnp.ndarray:
    """Dense per-gaussian attrs -> packed [N, NROWS] (row layout above)."""
    n = means2d.shape[0]
    return jnp.concatenate([
        means2d,                       # 0,1
        conic,                         # 2,3,4
        opacity[:, None],              # 5
        color,                         # 6,7,8
        depth[:, None],                # 9
        alpha_gate(opacity)[:, None],  # 10 (ellipse cutoff)
        jnp.zeros((n, NROWS - 11), jnp.float32),
    ], axis=1)
