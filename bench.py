"""Benchmark: 1080p differentiable splat render (RGB+depth) FPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"breakdown"} where vs_baseline is FPS / 100 (the driver's north-star
target of >=100 FPS at 1080p, BASELINE.md "Rebuild targets"; the
reference publishes no numbers).

The breakdown makes "fast" auditable instead of asserted:
- per-stage times from jitted multi-op sub-graphs (single-op timings lie
  under the axon tunnel; composite graphs track real code changes),
- three ON-DEVICE measured ceilings — HBM copy bandwidth, dense bf16
  MXU matmul throughput, and sustained VPU f32 elementwise rate (via
  an xplane trace; wall-clock lies for that chain shape under axon) —
  and the hot stages' achieved fractions of them: the pair gather's
  bytes/s vs the copy ceiling, and the composite vs BOTH compute
  ceilings (composite_vpu_frac near 1.0 = the kernel is at the vector
  unit's speed-of-light; its MXU fraction is small because the
  prefix-sum tri-matmuls overlap the VPU work). The same trace reports
  the composite kernel's device self-time, and the composite also
  reports pair-pixels/s, its hardware-independent work rate.

Runs on whatever the default JAX backend is (the driver provides one real
TPU chip via axon). Scene: 100k procedurally-placed gaussians; the
breakdown additionally carries a `scale_2m` row — the same 1080p render
on a 2M-gaussian scene (reference Mip-360 scale, wide sort keys,
multi-million pairs) so the metric is proven at the reference's real
workload size, not just the toy scene.
"""

import json
import os
import sys
import time

import numpy as np


def _timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def _timeit_min(fn, *args, iters=10, reps=3):
    """Min over ``reps`` PIPELINED means — the null-dispatch baseline
    must be measured exactly like the stages (async dispatch loop, one
    final sync): a per-call-sync variant measures the full ~31 ms
    tunnel round trip instead of the ~3.4 ms pipelined inter-call
    overhead, and a single mean can catch a latency spike (6.9 ms seen
    once). Min-of-3 pipelined means is spike-robust and
    semantics-correct."""
    import jax
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera,
                                                      binning, geometry,
                                                      pallas_composite,
                                                      render,
                                                      segment_reduce)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    n = 100_000
    rng = np.random.default_rng(0)
    # A ball of splats plus a ground plane, roughly framed by the camera.
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

    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=1920, height=1080)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)

    # 13*n covers this scene's true pair count (~12.2*n with the 3-sigma
    # AABB rects). Every budgeted slot rides the pair sort and the
    # attribute gather, so the budget is kept tight and overflow-checked
    # below before timing. (Segments are unaligned since round 3 — no
    # alignment-padding pairs exist. 8x16 tiles measured 29.9 FPS vs
    # 16x16's 43.0: the +71% pair count beats the halved per-pair pixel
    # work — see PERF.md round 3.)
    PB = 13 * n
    kwargs = dict(sh_degree=0, pair_budget=PB, backend="pallas")

    # Warmup / compile (worst-case expansion window).
    out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)

    # No-overflow check: the timed config must not clip pairs.
    if int(out.pairs) > PB:
        print(f"pair budget overflow: {int(out.pairs)}", file=sys.stderr)
        return 1

    # Tighten the pair-expansion window to this scene's measured need
    # (+16 margin, 16-aligned): the expansion kernel costs ~P*window/128
    # MXU cycles, and the worst-case window (288) is ~3x what typical
    # scenes use. The re-render below re-checks the need so the timed
    # config is provably uncorrupted.
    need = int(out.expand_needed)
    window = max(-(-(need + 16) // 16) * 16, 32)
    if window < 288:
        kwargs["expand_window"] = window
        out = render(params, rcam, bg, **kwargs)
        if int(out.expand_needed) > window:  # pathological; fall back
            kwargs.pop("expand_window")
            out = render(params, rcam, bg, **kwargs)

    dt, out = _timeit(lambda: render(params, rcam, bg, **kwargs),
                      iters=20)
    fps = 1.0 / dt

    # ---- breakdown: stage times (each a jitted composite sub-graph) ---
    tiles_x, tiles_y = -(-1920 // 16), -(-1080 // 16)
    CHUNK = pallas_composite.CHUNK

    @jax.jit
    def stage_project(params):
        return geometry.project_gaussians(
            params.xyz, params.features(), params.act_opacity()[:, 0],
            params.act_scaling(), params.act_rotation(), params.live,
            rcam.world_view, rcam.full_proj, rcam.campos, rcam.tan_fovx,
            rcam.tan_fovy, rcam.width, rcam.height, 0, 1.0, None)

    from multiview_inpaint_tpu.ops.rasterizer import bf16_transport

    @jax.jit
    def stage_binning(proj):
        return binning.bin_gaussians(
            proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
            16, 16, PB, 1024, gather_ids=False, aligned_chunk=CHUNK,
            extent=proj.extent, expand_kernel=True,
            expand_window=kwargs.get("expand_window", 0))

    @jax.jit
    def stage_gather(proj, bins):
        packed = pallas_composite.pack_attrs(
            proj.means2d, proj.conic, proj.opacity, proj.color,
            proj.depth)
        return bf16_transport.pair_attrs_bf16(
            packed, bins.order, bins.gid_sorted, bins.rank_lo)

    @jax.jit
    def stage_composite(attrs_t, seg_start, counts):
        return pallas_composite.composite_pallas(
            attrs_t, seg_start, counts, bg, tiles_x, tiles_y)

    t_proj, proj = _timeit(stage_project, params)
    t_bin, bins = _timeit(stage_binning, proj)
    t_gather, attrs_t = _timeit(stage_gather, proj, bins)
    t_comp, _ = _timeit(stage_composite, attrs_t, bins.seg_start,
                        bins.counts)

    # ---- on-device ceilings ------------------------------------------
    # Single-op calls through the axon tunnel pay ~2-4 ms of dispatch,
    # which would understate both ceilings ~8x. So: measure the null
    # dispatch itself (subtracted from the stage times below), and time
    # N dependent passes inside ONE jit for each ceiling.
    t_disp = _timeit_min(jax.jit(lambda x: x), jnp.zeros((8, 128)),
                         iters=20)

    # HBM bandwidth: 16 loop-carried x*c+1 passes over 256 MiB — each
    # reads+writes the buffer; the multiply keeps XLA from folding the
    # chain into one pass.
    big = jnp.zeros((64 * 1024 * 1024,), jnp.float32)
    passes = 16

    @jax.jit
    def hbm_chain(x):
        return jax.lax.fori_loop(
            0, passes, lambda i, x: x * 1.000000119 + 1.0, x)

    t_copy, _ = _timeit(hbm_chain, big)
    hbm_gbps = passes * 2 * big.size * 4 / max(t_copy - t_disp,
                                               1e-9) / 1e9

    # MXU ceiling: 16 chained dense bf16 4096^3 matmuls, 137.4 GFLOP
    # each.
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        return jax.lax.fori_loop(0, passes, lambda i, x: x @ a, a)

    t_mm, _ = _timeit(mm_chain, a)
    mxu_tflops = passes * 2 * 4096 ** 3 / max(t_mm - t_disp,
                                              1e-9) / 1e12

    # VPU elementwise ceiling — the roofline that actually binds the
    # composite (it runs ~13% MXU; its per-chunk cost is VPU vector
    # ops). Two measurement traps (exp_vpu_ceiling.py): wall-clock
    # block_until_ready reads ~0 for this chain shape under axon, so
    # the time comes from an xplane trace; and an affine y*c+d chain is
    # algebraically collapsed by XLA, so the chain squares
    # (y*y*1e-10 + 0.5 — a stable fixed point, 2 vector ops per step).
    # The same trace captures the composite kernel's device self-time.
    vpu_tops = None
    comp_dev_ms = None
    stage_dev_ms = None
    try:
        import glob
        import os
        import shutil
        import tempfile

        os.environ.setdefault(
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        k_inner, vpu_iters, dev_iters = 32, 5, 10
        xv = jnp.full((16 * 1024 * 1024,), 1.0, jnp.float32)

        @jax.jit
        def sq_chain(x):
            def body(_, y):
                for _ in range(k_inner):
                    y = y * y * 1e-10 + 0.5
                return y
            return jax.lax.fori_loop(0, passes, body, x)

        tbase = tempfile.mkdtemp(prefix="bench_trace_")

        def device_ms(fn, iters, tag):
            """Total 'XLA Ops' device self-time per call, via xplane —
            the only truthful clock for single-op graphs under axon."""
            from tensorflow.tsl.profiler.protobuf import xplane_pb2
            jax.block_until_ready(fn())
            d = os.path.join(tbase, tag)
            shutil.rmtree(d, ignore_errors=True)
            jax.profiler.start_trace(d)
            for _ in range(iters):
                o_ = fn()
            jax.block_until_ready(o_)
            jax.profiler.stop_trace()
            pbs = sorted(glob.glob(d + "/**/*.xplane.pb",
                                   recursive=True))
            xs = xplane_pb2.XSpace()
            with open(pbs[-1], "rb") as f:
                xs.ParseFromString(f.read())
            tot = comp = 0.0
            for plane in xs.planes:
                if not plane.name.startswith("/device:TPU"):
                    continue
                for line in plane.lines:
                    if line.name != "XLA Ops":
                        continue
                    meta = plane.event_metadata
                    for ev in line.events:
                        tot += ev.duration_ps / 1e9
                        if "composite_pallas" in (
                                meta[ev.metadata_id].name):
                            comp += ev.duration_ps / 1e9
            return tot / iters, comp / iters

        t_sq_ms, _ = device_ms(lambda: sq_chain(xv), vpu_iters, "vpu")
        vpu_tops = (xv.size * 2 * k_inner * passes
                    / max(t_sq_ms / 1e3, 1e-9) / 1e12)
        # Device-true stage times (the wall-clock stage rows above carry
        # tunnel-dispatch noise and need not sum to full_frame; these
        # do, up to inter-op gaps).
        d_proj, _ = device_ms(lambda: stage_project(params), dev_iters,
                              "proj")
        d_bin, _ = device_ms(lambda: stage_binning(proj), dev_iters,
                             "bin")
        d_gat, _ = device_ms(lambda: stage_gather(proj, bins),
                             dev_iters, "gath")
        d_comp, comp_dev = device_ms(
            lambda: stage_composite(attrs_t, bins.seg_start,
                                    bins.counts), dev_iters, "comp")
        d_frame, _ = device_ms(
            lambda: render(params, rcam, bg, **kwargs), dev_iters,
            "frame")
        comp_dev_ms = comp_dev
        stage_dev_ms = {
            "project": round(d_proj, 2), "binning": round(d_bin, 2),
            "pair_gather": round(d_gat, 2),
            "composite": round(d_comp, 2),
            "full_frame": round(d_frame, 2),
        }
    except Exception as e:  # tf protobuf absent / trace failure
        print(f"vpu ceiling unavailable: {e!r}", file=sys.stderr)

    # ---- achieved fractions ------------------------------------------
    pairs = int(out.pairs)
    # Gather stage: random-access read of 16 f32 rows per budgeted slot
    # + sequential write (the measured floor is latency, not bandwidth —
    # the fraction shows exactly how far below the streaming ceiling
    # random access lands).
    gather_bytes = PB * 16 * 4 * 2
    gather_gbps = gather_bytes / max(t_gather - t_disp, 1e-9) / 1e9

    # Composite: chunk iterations (upper bound; saturation early-exit
    # can retire tiles sooner) and the tri-matmul MXU flops they imply.
    seg = np.asarray(bins.seg_start)
    cnt = np.asarray(bins.counts)
    off = seg - (seg // CHUNK) * CHUNK
    chunks = int(np.sum(np.where(cnt > 0,
                                 -(-(off + cnt) // CHUNK), 0)))
    pix = 256
    t_comp_net = max(t_comp - t_disp, 1e-9)
    comp_mxu_flops = chunks * 2 * 2 * pix * CHUNK * CHUNK  # 2 bf16 passes
    comp_mxu_frac = comp_mxu_flops / t_comp_net / 1e12 / mxu_tflops
    pair_pixels_per_s = pairs * pix / t_comp_net

    # Composite VPU fraction: the kernel body runs ~44 full-width
    # vector instructions per [PIX, CHUNK] chunk (counted from
    # pallas_composite._kernel: dx/dy 2, fma-chain power 7,
    # exp/gate/alpha ~10, log1p+cumsum splits 6, T/w chain 8, bf16 w
    # split 4, lane-reduce ~7 — [pix,1] narrows cost full vregs), i.e.
    # 44*PIX*CHUNK element-ops per chunk, vs the MEASURED sustained VPU
    # rate. >= ~0.9 means the kernel is at the vector unit's
    # speed-of-light and further gains need fewer ops, not scheduling;
    # fractions slightly ABOVE 1.0 are real: the count includes the
    # transcendentals and the cumsum operand converts, which partially
    # retire on the EUP/MXU concurrently with VPU issue.
    comp_vpu_frac = None
    if vpu_tops and comp_dev_ms:
        comp_elem_ops = 44 * pix * CHUNK * chunks
        comp_vpu_frac = (comp_elem_ops / (comp_dev_ms / 1e3)
                         / 1e12 / vpu_tops)

    # Stage times carry one tunnel dispatch each; report them net of
    # the measured null dispatch so they sum toward full_frame.
    net = lambda t: round(max(t - t_disp, 0.0) * 1e3, 2)  # noqa: E731
    breakdown = {
        "dispatch_ms": round(t_disp * 1e3, 2),
        "stages_ms": {
            "project": net(t_proj),
            "binning": net(t_bin),
            "pair_gather": net(t_gather),
            "composite": net(t_comp),
            "full_frame": round(dt * 1e3, 2),
        },
        "pairs": pairs,
        "stages_device_ms": stage_dev_ms,
        "ceilings": {
            "hbm_copy_gbps": round(hbm_gbps, 1),
            "mxu_bf16_tflops": round(mxu_tflops, 1),
            "vpu_f32_tops": (round(vpu_tops, 2) if vpu_tops else None),
        },
        "gather_gbps": round(gather_gbps, 1),
        "gather_hbm_frac": round(gather_gbps / hbm_gbps, 3),
        "composite_chunk_iters": chunks,
        "composite_device_ms": (round(comp_dev_ms, 2)
                                if comp_dev_ms else None),
        "composite_mxu_frac": round(comp_mxu_frac, 3),
        "composite_vpu_frac": (round(comp_vpu_frac, 3)
                               if comp_vpu_frac else None),
        "composite_gpairpix_per_s": round(pair_pixels_per_s / 1e9, 2),
    }

    # ---- multi-chip projection: band-sharded frame (PERF.md) ----------
    # One executable renders any INTERLEAVED band (device d owns tile
    # rows d, d+8, ... — adjacent rows carry similar splat loads, so
    # bands balance to ~1/8 of the frame's pairs where contiguous bands
    # measured 15x apart); the worst band's time is the 8-chip frame
    # latency (render_frame_sharded shards bands with zero collectives).
    # Guarded: a failure here must not cost the driver its metric line.
    try:
        n_bands = 8
        band_rows = -(-tiles_y // n_bands)
        bkw = dict(kwargs)
        bkw.pop("expand_window", None)
        bkw["pair_budget"] = int(2.5 * n)
        bkw["band_rows"] = band_rows
        bkw["band_stride"] = n_bands
        # Validation pass: the same no-overflow invariant as the
        # headline metric — a clipped band is a cheaper, corrupted
        # render and must never be timed into the projection. Also
        # collects the worst expansion-window need to tighten the
        # timed config exactly like the full-frame path.
        band_need = band_act = 0
        for r0 in range(n_bands):
            bout = render(params, rcam, bg,
                          band_row0=jnp.int32(r0), cull_n=n, **bkw)
            if (int(bout.pairs) > bkw["pair_budget"]
                    or int(bout.expand_needed) > 288):
                raise RuntimeError(
                    f"band {r0} overflow: pairs={int(bout.pairs)} "
                    f"need={int(bout.expand_needed)}")
            band_need = max(band_need, int(bout.expand_needed))
            band_act = max(band_act, int(bout.cull_needed))
        bkw["expand_window"] = max(
            -(-(band_need + 16) // 16) * 16, 32)
        # Per-band N-culling: a stride-8 band touches ~43% of this
        # scene's gaussians; truncating the depth-rank compaction to
        # the measured active count (+15%, 8k-aligned) shrinks every
        # N-proportional stage (measured 3.05 -> 2.89 ms device at 8
        # bands, PERF.md round 4). Probe-validated below before timing.
        cull = min(-(-int(band_act * 1.15) // 8192) * 8192, n)
        if cull < n:
            bkw["cull_n"] = cull
        worst, worst_r0 = 0.0, 0
        for r0 in range(n_bands):
            bout = render(params, rcam, bg,
                          band_row0=jnp.int32(r0), **bkw)
            if int(bout.expand_needed) > bkw["expand_window"]:
                raise RuntimeError("band window corruption")
            if "cull_n" in bkw and int(bout.cull_needed) > bkw["cull_n"]:
                raise RuntimeError("band cull corruption")
            bt = _timeit_min(
                lambda r0=r0: render(params, rcam, bg,
                                     band_row0=jnp.int32(r0),
                                     **bkw), iters=10, reps=2)
            if bt > worst:
                worst, worst_r0 = bt, r0
        breakdown["band_worst_ms"] = round(worst * 1e3, 2)
        breakdown["band_8chip_projected_fps"] = round(1.0 / worst, 1)
        breakdown["band_cull_n"] = bkw.get("cull_n")
        # Device self-time of the worst band (xplane): the wall number
        # above carries ~2x of axon tunnel dispatch + launch gaps that
        # a real pod does not pay — this is the hardware-truth bound.
        try:
            bdev, _ = device_ms(
                lambda: render(params, rcam, bg,
                               band_row0=jnp.int32(worst_r0), **bkw),
                dev_iters, "band")
            breakdown["band_worst_device_ms"] = round(bdev, 2)
            breakdown["band_8chip_device_fps"] = round(1e3 / bdev, 1)
        except Exception as e:  # noqa: BLE001
            print(f"band device time skipped: {e}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"band projection skipped: {e}", file=sys.stderr)

    # ---- reference-scale row: 2M gaussians, wide sort keys ------------
    # The reference's real workload is Mip-360 backgrounds densified to
    # 1-6M gaussians (gs-simp/scene/gaussian_model.py densify loop;
    # inpaint_rec.py:54-58 seeds 30k MORE on top). The headline scene is
    # 100k; this row proves the same 1080p render at 20x that, where the
    # binning runs WIDE (tile, rank) sort keys (packed int32 keys
    # overflow past 262k gaussians at 1080p) and multi-million-pair
    # tables hit the narrow-lane gather cliffs (PERF.md round 4).
    # Guarded: a failure here must not cost the driver its metric line.
    try:
        from multiview_inpaint_tpu.utils.synthetic import make_big_scene
        ns = 2_000_000
        sparams = make_big_scene(ns)
        spb = int(2.6 * ns)  # measured ~2.33 pairs/gaussian + slack
        skw = dict(sh_degree=0, pair_budget=spb, backend="pallas")
        sout = render(sparams, rcam, bg, **skw)
        jax.block_until_ready(sout.rgb)
        spairs, regrows = int(sout.pairs), 0
        while spairs > spb:  # adaptive budget regrow (re-jit)
            from multiview_inpaint_tpu.ops.rasterizer.pair_expand import (
                MAX_PAIR_BUDGET)
            if spb >= MAX_PAIR_BUDGET:
                raise RuntimeError(
                    f"scene needs {spairs} pairs > pallas budget cap "
                    f"{MAX_PAIR_BUDGET}")
            spb = min(spb * 2, MAX_PAIR_BUDGET)
            skw["pair_budget"] = spb
            regrows += 1
            sout = render(sparams, rcam, bg, **skw)
            spairs = int(sout.pairs)
        sneed = int(sout.expand_needed)
        swin = max(-(-(sneed + 16) // 16) * 16, 32)
        if swin < 288:
            skw["expand_window"] = swin
            sout = render(sparams, rcam, bg, **skw)
            if int(sout.expand_needed) > swin:
                skw.pop("expand_window")
        sdt = _timeit_min(lambda: render(sparams, rcam, bg, **skw),
                          iters=5, reps=2)
        scale_row = {
            "n_gaussians": ns,
            "pairs": spairs,
            "pair_budget": spb,
            "budget_regrows": regrows,
            "expand_window": skw.get("expand_window", 288),
            "wall_ms": round(sdt * 1e3, 2),
            "fps": round(1.0 / sdt, 2),
        }
        try:
            sdev, _ = device_ms(
                lambda: render(sparams, rcam, bg, **skw), 5, "scale")
            scale_row["device_ms"] = round(sdev, 2)
        except Exception as e:  # noqa: BLE001
            print(f"scale device time skipped: {e}", file=sys.stderr)
        breakdown["scale_2m"] = scale_row
        del sparams, sout
    except Exception as e:  # noqa: BLE001
        print(f"scale row skipped: {e!r}", file=sys.stderr)

    # ---- SVD inference clip (VERDICT r4 #5) ---------------------------
    # The reference's other headline workload: one 25-step Euler-EDM
    # guided sample (CFG-doubled 28-frame batch through UNet+ControlNet)
    # + VideoDecoder decode at 512x384x14
    # (svd_inpaint1/configs/test/svd_f_est_ctrl_simp1.yaml:161-177).
    # Run in a subprocess so the 2.94B model's HBM is returned before
    # the driver reads our JSON, and a hang can't cost the metric line.
    if os.environ.get("BENCH_SKIP_SVD") != "1":
        try:
            import subprocess
            r = subprocess.run(
                [sys.executable, "-u",
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_svd_clip.py")],
                capture_output=True, text=True, timeout=3600)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            clip = json.loads(line)
            breakdown["svd_clip"] = {
                "clip_s": clip["value"], "sample_s": clip["sample_s"],
                "decode_s": clip["decode_s"], "steps": clip["steps"],
                "note": ("25-step/14-frame 512x384 guided sample + "
                         "decode; reference H100 wall-clock is the bar "
                         "(BASELINE.md)"),
            }
        except Exception as e:  # noqa: BLE001
            print(f"svd clip row skipped: {e!r}", file=sys.stderr)

    # ---- GS train step at reference scale (VERDICT r4 #1/#2) ----------
    # 2M-gaussian train step (render fwd + fused pallas bwd + Adam,
    # 512x384 view) — the reference's training-workload scale (graphdeco
    # CUDA training runs Mip-360 scenes at 1-6M splats). Subprocess so
    # the 2M-capacity compile + buffers don't bloat the driver process.
    if os.environ.get("BENCH_SKIP_GSTRAIN") != "1":
        try:
            import subprocess
            r = subprocess.run(
                [sys.executable, "-u",
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_gs_train_step.py"),
                 "--n", "2000000", "--capacity", "2097152"],
                capture_output=True, text=True, timeout=2400)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            row = json.loads(line)
            breakdown["gs_train_2m"] = {
                "step_ms": row["step_ms"], "it_per_s": row["it_per_s"],
                "fwd_ms": row["fwd_ms"], "fwd_bwd_ms": row["fwd_bwd_ms"],
                "pairs": row["pairs"],
                "note": ("2M live / 2M capacity train step, 512x384 "
                         "view, tight pair budget; wall incl. dispatch "
                         "(device-true round-4 xplane ref: 180.3 ms)"),
            }
        except Exception as e:  # noqa: BLE001
            print(f"gs train row skipped: {e!r}", file=sys.stderr)

    # Self-description: vs_baseline is FPS/100 against BASELINE.md's
    # ">=100 FPS per chip on TPU v5p" north star, but this container's
    # chip is a v5e-lite (measured ceilings in `breakdown.ceilings`;
    # v5p's published HBM/MXU rates are ~2-2.5x v5e's). The band_8chip_*
    # rows are PROJECTIONS from single-chip band timings (worst band x
    # 8) — real multi-chip hardware is not available here; correctness
    # of the sharded path is gated by the virtual-mesh dryrun instead.
    print(json.dumps({
        "metric": "splat_render_1080p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
        "hardware": ("1x TPU v5e-lite via axon tunnel; the >=100 FPS "
                     "target names v5p (~2-2.5x v5e per-chip rates)"),
        "multi_chip_note": ("band_8chip_*_fps are projections "
                            "(worst single-chip band x 8 chips); "
                            "virtual-mesh dryrun gates correctness"),
        "breakdown": breakdown,
    }))


if __name__ == "__main__":
    sys.exit(main())
