"""Densification growth to reference scale: the capacity-doubling path.

The reference's train loop densifies for 15k iterations and lands at
1-6M gaussians on Mip-360 scenes (``gs-simp/scene/gaussian_model.py:426-480``;
``train.py:112-124``). This repo's design replaces torch's
reallocate-every-100-iters with FIXED-capacity buffers + a live mask,
doubling capacity (one re-jit) only when densification runs out of free
slots (``models/gs_trainer.py:grow_if_needed``). Round <=3 only ever
exercised that path to 262k; this script drives a REAL
densification-pressured training run from ~250k live through multiple
capacity doublings past 1M on the actual chip, and reports the costs
that matter for operability at scale:

- compile (re-jit) seconds at each new (capacity, pair_budget) config,
- steady step ms at each capacity plateau,
- live-count / capacity trajectory and densify event sizes,
- loss finiteness + decrease (the run must be a real optimization, not
  a shape stress test).

Setup mirrors the reference dynamics: the trainable model is a sparse
subsample of a detailed 2M-gaussian synthetic scene and the targets are
renders OF the full scene from an orbit of cameras, so photometric
grads genuinely demand new geometry where detail is missing.

    python -u scripts/exp_densify_scale.py --iters 1600
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def orbit_cameras(n_cams: int, radius: float, width: int, height: int):
    """COLMAP-convention orbit around the origin (graphdeco R = c2w
    rotation, T = w2c translation — ``gs/cameras.make_camera``)."""
    from multiview_inpaint_tpu.gs.cameras import make_camera
    cams = []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        c = np.array([radius * np.sin(th), 0.35, radius * np.cos(th)])
        f = -c / np.linalg.norm(c)                    # look at origin
        up = np.array([0.0, 1.0, 0.0])
        r = np.cross(up, f)
        r /= np.linalg.norm(r)
        u = np.cross(f, r)
        r_c2w = np.stack([r, u, f], axis=1)
        t = -r_c2w.T @ c
        cams.append(make_camera(i, r_c2w, t, fovx=1.1, fovy=0.85,
                                width=width, height=height))
    return cams


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_target", type=int, default=2_000_000)
    p.add_argument("--n_init", type=int, default=250_000)
    p.add_argument("--iters", type=int, default=1600)
    p.add_argument("--n_cams", type=int, default=8)
    p.add_argument("--grad_thr", type=float, default=0.0,
                   help="densify grad threshold; 0 = auto-calibrate to "
                        "the --grow_frac quantile of the measured "
                        "grad-stat distribution at the first event (the "
                        "reference's fixed 2e-4 grows ~15x over 15k "
                        "iters; this run must reach the same doublings "
                        "inside a much smaller iteration budget)")
    p.add_argument("--grow_frac", type=float, default=0.35,
                   help="fraction of live gaussians that should exceed "
                        "the auto-calibrated threshold per densify event")
    p.add_argument("--densify_interval", type=int, default=100)
    p.add_argument("--pair_mult", type=float, default=4.0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--report_every", type=int, default=100)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # NOTE: do NOT enable jax_compilation_cache_dir under the axon
    # backend — the remote-compiled executables don't serialize and the
    # first compile hangs indefinitely (observed: GT renders that take
    # 71s without the cache never completed with it).
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians as g_mod
    from multiview_inpaint_tpu.models import gs_trainer
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene

    backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    log(f"backend={jax.default_backend()} rasterizer={backend}")
    w, h = (256, 192) if args.cpu else (512, 384)

    target = make_big_scene(args.n_target)
    cams = orbit_cameras(args.n_cams, 3.2, w, h)
    bg = jnp.zeros(3, jnp.float32)

    # Ground truth = renders of the FULL detailed scene.
    t0 = time.time()
    gts = []
    for cam in cams:
        out = render(target, RenderCamera.from_camera(cam), bg,
                     sh_degree=0, backend=backend,
                     pair_budget=int(2.6 * args.n_target),
                     interpret=args.cpu)
        gts.append(np.asarray(jnp.clip(out.rgb, 0, 1)))
    del target
    log(f"GT renders: {len(gts)} views in {time.time()-t0:.1f}s")

    # Trainable init: a sparse subsample (detail must be densified in).
    full = make_big_scene(args.n_target)
    sel = np.random.default_rng(1).choice(
        args.n_target, args.n_init, replace=False)
    sel.sort()
    init = g_mod.from_arrays(
        np.asarray(full.xyz)[sel], np.asarray(full.features_dc)[sel],
        np.asarray(full.features_rest)[sel],
        np.asarray(full.opacity)[sel], np.asarray(full.scaling)[sel],
        np.asarray(full.rotation)[sel],
        capacity=-(-args.n_init // 8192) * 8192)
    del full
    state = gs_trainer.init_state(init)
    log(f"init: {args.n_init} live in capacity {init.capacity}; "
        f"first train_step compile...")

    cfg = gs_trainer.OptimizationConfig(
        iterations=args.iters,
        densify_from_iter=args.densify_interval,
        densification_interval=args.densify_interval,
        densify_until_iter=args.iters,
        densify_grad_threshold=args.grad_thr or 2e-4,
        opacity_reset_interval=10 ** 9,  # isolate the growth mechanics
        position_lr_max_steps=args.iters)
    calibrated = args.grad_thr > 0

    key = jax.random.key(0)
    spatial = 3.5
    pair_mult = args.pair_mult
    plateau = []           # step wall times at the current config
    cur_cfg = (state.params.capacity, pair_mult)
    compile_s = None
    first_loss = None
    events = []
    t_cfg = time.time()

    for it in range(1, args.iters + 1):
        cam = cams[(it - 1) % len(cams)]
        rcam = RenderCamera.from_camera(cam)
        gt = jnp.asarray(gts[(it - 1) % len(cams)])
        t0 = time.time()
        state, metrics = gs_trainer.train_step(
            state, rcam, gt, bg, cfg, spatial_lr_scale=spatial,
            sh_degree=0, pair_budget_mult=pair_mult, backend=backend)
        if (state.params.capacity, pair_mult) != cur_cfg or it == 1:
            # first step at a new config pays the re-jit
            jax.block_until_ready(metrics.loss)
            compile_s = time.time() - t0
            events.append({"iter": it, "event": "rejit",
                           "capacity": state.params.capacity,
                           "pair_mult": pair_mult,
                           "compile_s": round(compile_s, 1)})
            log(f"it={it}: re-jit at capacity={state.params.capacity} "
                f"mult={pair_mult} ({compile_s:.1f}s)")
            cur_cfg = (state.params.capacity, pair_mult)
            plateau = []
            t_cfg = time.time()
        else:
            plateau.append(time.time() - t0)

        if (not calibrated
                and it == cfg.densify_from_iter - 1):
            # Auto-calibrate the threshold: the --grow_frac quantile of
            # the accumulated mean screen-space grad over live rows.
            acc = np.asarray(state.stats.grad_accum)
            den = np.asarray(state.stats.denom)
            live_m = np.asarray(state.params.live) & (den > 0)
            mean_g = acc[live_m] / den[live_m]
            thr = float(np.quantile(mean_g, 1.0 - args.grow_frac))
            cfg = dataclasses.replace(cfg, densify_grad_threshold=thr)
            calibrated = True
            log(f"it={it}: calibrated grad_thr={thr:.2e} "
                f"(q{1 - args.grow_frac:.2f} of {mean_g.size} live)")
            events.append({"iter": it, "event": "calibrate",
                           "grad_thr": thr})

        key, sub = jax.random.split(key)
        state, info = gs_trainer.maybe_densify(state, sub, cfg, spatial, it)
        grew = info and info.get("granted", 0) < info.get("wanted", 0)
        state = gs_trainer.grow_if_needed(state, info)
        if info:
            info = {k: v for k, v in info.items()}
            info.update(iter=it, event="densify", grew=bool(grew),
                        capacity=state.params.capacity)
            events.append(info)

        if it % args.report_every == 0 or it == args.iters:
            loss = float(metrics.loss)
            pairs = int(metrics.pairs)
            live = int(metrics.num_live)
            if first_loss is None:
                first_loss = loss
            assert np.isfinite(loss), f"loss diverged at {it}"
            med = (sorted(plateau)[len(plateau) // 2] * 1e3
                   if plateau else None)
            log(f"it={it} loss={loss:.4f} live={live} "
                f"cap={state.params.capacity} pairs={pairs} "
                f"step_ms={med and round(med, 1)}")
            if pairs > 0.85 * pair_mult * state.params.capacity:
                pair_mult *= 2
            row = {"metric": "densify_scale_progress", "iter": it,
                   "loss": round(loss, 5), "live": live,
                   "capacity": state.params.capacity, "pairs": pairs,
                   "expand_needed": int(metrics.expand_needed),
                   "pair_overflow": bool(
                       pairs > pair_mult * state.params.capacity),
                   "step_ms_median": med and round(med, 2),
                   "config_age_s": round(time.time() - t_cfg, 1)}
            print(json.dumps(row), flush=True)

    final_loss = float(metrics.loss)
    live = int(metrics.num_live)
    print(json.dumps({
        "metric": "densify_scale_summary",
        "init_live": args.n_init,
        "final_live": live,
        "final_capacity": state.params.capacity,
        "doublings": sum(1 for e in events
                         if e.get("event") == "densify" and e["grew"]),
        "rejits": sum(1 for e in events if e.get("event") == "rejit"),
        "rejit_s": [e["compile_s"] for e in events
                    if e.get("event") == "rejit"],
        "first_loss": round(first_loss, 5),
        "final_loss": round(final_loss, 5),
        "loss_decreased": final_loss < first_loss,
        "grew_past_1m": live > 1_000_000,
    }), flush=True)


if __name__ == "__main__":
    main()
