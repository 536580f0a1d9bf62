"""Full reference-cadence GS training at scale on TPU (VERDICT r4 #1).

Runs the reference's REAL 30k-iteration optimization schedule
(``/root/reference/gs-simp/arguments/__init__.py:76-95`` +
``train.py:51-132``): densify every 100 iters in [500, 15000), opacity
reset every 3000, exponential xyz LR over 30k steps, L1+SSIM
(lambda_dssim 0.2) — on a scene whose detail pressure densifies the
model past 1.5M live gaussians, on the actual chip. Unlike
``exp_densify_scale.py`` (which compressed the doublings into 1-1.6k
iters and disabled opacity resets to isolate growth mechanics), this is
the operability proof: the trainer must survive the full workload —
opacity-reset/prune cycles, capacity doublings mid-schedule, adaptive
pair-budget regrows, 30k steps of wall-clock — and end with a real
reconstruction (PSNR reported on a held-out view).

Two modes:
  --mode recon     30k-iter background-reconstruction schedule
                   (OptimizationConfig defaults).
  --mode inpaint   the stage-2 object-reconstruction schedule
                   (``inpaint_rec.py:112-123``): dual loss — full-frame
                   L1+SSIM on "inpainted" views alternating with
                   background-masked L1+SSIM on "original" views
                   (reference alternates losses over its two camera
                   sets), same 30k/densify-100 cadence.

The grad threshold is auto-calibrated (the reference's fixed 2e-4 is
tuned to COLMAP-initialised real captures; a synthetic subsample needs a
scene-appropriate value): one iteration before every densify event the
threshold is set on-device to the k-th largest live mean-gradient,
where k tracks a linear live-count ramp from n_init at iter 500 to
~1.8M at the end of the densify phase. Selection-by-quantile is the
only deviation from the fixed-threshold reference rule (every other
cadence mechanism — intervals, opacity resets, min-opacity/screen-size
pruning, clone-vs-split, LR schedule — is the reference's); it is
logged per event as ``grad_thr`` so the trajectory is auditable. The
first run of this script used a fixed first-event quantile and stalled:
post-reset pruning outpaced growth (live 315k -> 122k) and a host-side
recalibration crashed on an empty array right after the stats reset —
the per-event on-device controller fixes both.

    python -u scripts/run_reference_cadence.py --mode recon \
        --out /tmp/ref_cadence_recon.jsonl
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("recon", "inpaint"), default="recon")
    p.add_argument("--iters", type=int, default=30_000)
    p.add_argument("--n_target", type=int, default=2_000_000)
    p.add_argument("--n_init", type=int, default=250_000)
    p.add_argument("--n_cams", type=int, default=24,
                   help="orbit cameras; the last is held out for PSNR "
                        "(reference captures carry 100-300 views; 23 "
                        "train views keeps each gaussian visible from "
                        "several angles so opacity can recover between "
                        "reset and the next prune)")
    p.add_argument("--grow_frac_max", type=float, default=0.04,
                   help="per-event cap on the densify budget as a "
                        "fraction of live rows")
    p.add_argument("--n_live_target", type=int, default=1_800_000,
                   help="live-count ramp endpoint for the threshold "
                        "controller (reached near densify_until_iter)")
    p.add_argument("--pair_mult", type=float, default=3.0)
    p.add_argument("--res", default=None, metavar="WxH",
                   help="render/GT resolution (default 512x384 on TPU, "
                        "128x96 on CPU). 512x384 saturates honest "
                        "densify gradients near ~400k live — use "
                        "1920x1080 with --n_target 4000000 for the "
                        "reference's Mip-360-scale detail pressure")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="/tmp/ref_cadence.jsonl")
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--ckpt_every", type=int, default=5000,
                   help="periodic train-state checkpoint (npz + sidecar "
                        "json); 0 disables")
    p.add_argument("--resume", default=None,
                   help="path to a .npz train-state checkpoint written by "
                        "--ckpt_every (reads <path>.meta.json for the "
                        "iteration / pair_mult to resume from)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians as g_mod
    from multiview_inpaint_tpu.models import gs_trainer
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene
    from scripts.exp_densify_scale import orbit_cameras

    backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    w, h = (128, 96) if args.cpu else (512, 384)
    if args.res:
        w, h = (int(x) for x in args.res.lower().split("x"))
    log(f"backend={jax.default_backend()} rasterizer={backend} "
        f"mode={args.mode} {w}x{h} iters={args.iters}")
    outf = open(args.out, "a", buffering=1)

    def emit(row):
        row["t_wall_s"] = round(time.time() - t_start, 1)
        outf.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    t_start = time.time()
    target = make_big_scene(args.n_target)
    jax.block_until_ready(target.xyz)
    cams = orbit_cameras(args.n_cams, 3.2, w, h)
    bg = jnp.zeros(3, jnp.float32)
    emit({"event": "scene_ready", "n_target": args.n_target})

    t0 = time.time()
    gts = []
    for cam in cams:
        out = render(target, RenderCamera.from_camera(cam), bg,
                     sh_degree=0, backend=backend,
                     pair_budget=int(2.6 * args.n_target),
                     interpret=args.cpu)
        # Keep GT on DEVICE: re-uploading a 1080p frame through the
        # axon tunnel every step cost ~600 ms/step (measured — 780 ms
        # wall at 250k live vs ~90 ms device); 24 views is <600 MB HBM.
        gts.append(jnp.clip(out.rgb, 0, 1))
    log(f"GT renders: {len(gts)} views in {time.time()-t0:.1f}s")
    emit({"event": "gt_done", "views": len(gts)})
    train_ids = list(range(args.n_cams - 1))
    eval_id = args.n_cams - 1

    # Inpaint mode: a centered box plays the object region. "Original"
    # views use background-masked loss outside it; "inpainted" views use
    # the full-frame loss (reference inpaint_rec.py dual objective).
    mask = np.zeros((h, w), np.float32)
    mask[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1.0
    mask_j = jnp.asarray(mask)

    sel = np.random.default_rng(1).choice(
        args.n_target, args.n_init, replace=False)
    sel.sort()
    init = g_mod.from_arrays(
        np.asarray(target.xyz)[sel], np.asarray(target.features_dc)[sel],
        np.asarray(target.features_rest)[sel],
        np.asarray(target.opacity)[sel], np.asarray(target.scaling)[sel],
        np.asarray(target.rotation)[sel],
        capacity=-(-args.n_init // 8192) * 8192)
    del target
    state = gs_trainer.init_state(init)
    emit({"event": "init_done", "n_init": args.n_init,
          "capacity": state.params.capacity})

    if args.mode == "recon":
        cfg = gs_trainer.OptimizationConfig(
            iterations=args.iters, position_lr_max_steps=args.iters)
    else:
        base = gs_trainer.INPAINT_OPT
        # Reference inpaint_rec runs the stage-2 preset for 30k iters
        # (inpaint_rec.py:271-272 overrides iterations).
        cfg = dataclasses.replace(
            base, iterations=args.iters,
            densify_until_iter=min(15_000, args.iters),
            position_lr_max_steps=args.iters)
    # cfg is a STATIC jit arg of train_step: it must never change after
    # the first step (a changed threshold would recompile the whole
    # train step, ~55s/event — measured the hard way). The densify
    # calls get their own copy that the controller may mutate.
    cfg_d = cfg

    @jax.jit
    def _thr_for_budget(acc, den, live, k):
        """k-th largest live mean-gradient, on device (no host quantile
        on possibly-empty arrays — the stats reset right after a densify
        event empties the valid set). Non-finite accumulators are
        excluded and the result is floored above 0 so a tie-at-zero (or
        a poisoned stat) can never select every live row."""
        valid = live & (den > 0) & jnp.isfinite(acc)
        mean_g = jnp.where(valid, acc / jnp.maximum(den, 1.0), -jnp.inf)
        s = jnp.sort(mean_g)                      # ascending, -inf first
        n_valid = jnp.sum(valid)
        k = jnp.clip(k, 1, jnp.maximum(n_valid - 1, 1))
        return jnp.maximum(s[acc.shape[0] - 1 - k], 1e-12)

    @jax.jit
    def _param_audit(params):
        """(max live scaling param, any non-finite live row) — cheap
        divergence telemetry fetched every progress report."""
        live = params.live
        neg = jnp.float32(-jnp.inf)
        max_s = jnp.max(jnp.where(live, jnp.max(params.scaling, -1), neg))
        ok = (jnp.isfinite(params.xyz).all(-1)
              & jnp.isfinite(params.scaling).all(-1)
              & jnp.isfinite(params.opacity[:, 0]))
        bad = jnp.sum(live & ~ok)
        return max_s, bad

    key = jax.random.key(0)
    spatial = 3.5
    pair_mult = args.pair_mult
    start_iter = 1
    if args.resume:
        from multiview_inpaint_tpu.gs import checkpoint as gs_ckpt
        state = gs_ckpt.load_train_state(args.resume)
        with open(args.resume + ".meta.json") as f:
            meta = json.load(f)
        start_iter = int(meta["iter"]) + 1
        pair_mult = float(meta.get("pair_mult", pair_mult))
        emit({"event": "resumed", "from": args.resume,
              "iter": start_iter, "capacity": state.params.capacity})
    plateau = []
    cur_cfg = (state.params.capacity, pair_mult)
    events = {"rejit": 0, "regrow": 0, "calibrate": 0,
              "opacity_reset": 0, "doubling": 0}
    last_thr = None
    rejit_s = []
    first_loss = None
    loss_now = None
    t_cfg = time.time()

    def eval_psnr():
        out = render(state.params, RenderCamera.from_camera(cams[eval_id]),
                     bg, sh_degree=0, backend=backend,
                     pair_budget=int(pair_mult * state.params.capacity),
                     interpret=args.cpu)
        pred = jnp.clip(out.rgb, 0, 1)
        mse = float(jnp.mean((pred - gts[eval_id]) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    def save_ckpt(tag, it):
        from multiview_inpaint_tpu.gs import checkpoint as gs_ckpt
        path = args.out.rsplit(".", 1)[0] + f"_{tag}.npz"
        gs_ckpt.save_train_state(path, state)
        with open(path + ".meta.json", "w") as f:
            json.dump({"iter": it, "pair_mult": pair_mult}, f)
        emit({"event": "ckpt", "tag": tag, "iter": it, "path": path})

    nonfinite_acc = 0   # non-finite grad entries since last report
    step_hist = []      # (iter, live, step_ms) samples for the summary
    for it in range(start_iter, args.iters + 1):
        view = train_ids[(it - 1) % len(train_ids)]
        rcam = RenderCamera.from_camera(cams[view])
        gt = gts[view]
        if args.mode == "inpaint":
            # Alternate the dual objective over the view ring: even
            # slots are "original" views (background-preservation loss),
            # odd slots "inpainted" (full-frame loss).
            if view % 2 == 0:
                lm, m = "background", mask_j
            else:
                lm, m = "full", None
        else:
            lm, m = "full", None
        t0 = time.time()
        state, metrics = gs_trainer.train_step(
            state, rcam, gt, bg, cfg, spatial_lr_scale=spatial,
            sh_degree=0, mask=m, loss_mode=lm,
            pair_budget_mult=pair_mult, backend=backend)
        if (state.params.capacity, pair_mult) != cur_cfg or it == 1:
            jax.block_until_ready(metrics.loss)
            dt = time.time() - t0
            rejit_s.append(round(dt, 1))
            events["rejit"] += 1
            emit({"event": "rejit", "iter": it,
                  "capacity": state.params.capacity,
                  "pair_mult": pair_mult, "compile_s": round(dt, 1)})
            cur_cfg = (state.params.capacity, pair_mult)
            plateau = []
            t_cfg = time.time()
        else:
            plateau.append(time.time() - t0)

        # Budgeted threshold controller: right before each densify event
        # (stats still intact), set the threshold to the k-th largest
        # live mean-gradient where k tracks the live-count ramp.
        if (it < cfg.densify_until_iter and it >= cfg.densify_from_iter
                and it % cfg.densification_interval == 0):
            live_now = int(jnp.sum(state.params.live))
            ramp_end = cfg.densify_until_iter - 2 * cfg.densification_interval
            frac = min(max((it - cfg.densify_from_iter)
                           / max(ramp_end - cfg.densify_from_iter, 1), 0.0),
                       1.0)
            tgt = int(args.n_init + (args.n_live_target - args.n_init) * frac)
            k = int(np.clip(tgt - live_now, max(1, int(0.002 * live_now)),
                            int(args.grow_frac_max * live_now)))
            thr = float(_thr_for_budget(
                state.stats.grad_accum, state.stats.denom,
                state.params.live, jnp.int32(k)))
            if np.isfinite(thr):
                cfg_d = dataclasses.replace(cfg_d,
                                            densify_grad_threshold=thr)
                events["calibrate"] += 1
            else:  # poisoned stats: keep the previous threshold
                emit({"event": "thr_skip", "iter": it, "thr": repr(thr)})
            last_thr = (round(thr, 9), k, tgt)

        key, sub = jax.random.split(key)
        state, info = gs_trainer.maybe_densify(state, sub, cfg_d, spatial,
                                               it)
        grew = info and info.get("granted", 0) < info.get("wanted", 0)
        state = gs_trainer.grow_if_needed(state, info)
        if info.get("opacity_reset"):
            events["opacity_reset"] += 1
            emit({"event": "opacity_reset", "iter": it})
        if grew:
            events["doubling"] += 1
            emit({"event": "doubling", "iter": it,
                  "capacity": state.params.capacity, **{
                      k: info[k] for k in ("wanted", "granted")}})

        if args.ckpt_every and it % args.ckpt_every == 0:
            save_ckpt(f"it{it}", it)

        if it % 100 == 0 or it == args.iters:
            loss_now = float(metrics.loss)
            pairs = int(metrics.pairs)
            live = int(metrics.num_live)
            bad_grads = int(metrics.nonfinite_grads)
            max_s, bad_rows = _param_audit(state.params)
            max_s, bad_rows = float(max_s), int(bad_rows)
            if first_loss is None:
                first_loss = loss_now
            if (not np.isfinite(loss_now)) or pairs == 0 or bad_rows:
                save_ckpt(f"crash_it{it}", it)
                emit({"event": "crash", "iter": it, "loss": loss_now,
                      "pairs": pairs, "bad_rows": bad_rows,
                      "nonfinite_grads_step": bad_grads,
                      "max_scaling": round(max_s, 3)})
                sys.exit(2)
            med = (sorted(plateau)[len(plateau) // 2] * 1e3
                   if plateau else None)
            if med:
                step_hist.append((it, live, round(med, 1)))
            if pairs > 0.85 * pair_mult * state.params.capacity:
                pair_mult *= 2
                events["regrow"] += 1
                emit({"event": "pair_regrow", "iter": it,
                      "pair_mult": pair_mult, "pairs": pairs})
            row = {"event": "progress", "iter": it,
                   "loss": round(loss_now, 5), "live": live,
                   "capacity": state.params.capacity, "pairs": pairs,
                   "expand_needed": int(metrics.expand_needed),
                   "step_ms_median": med and round(med, 2),
                   "max_scaling": round(max_s, 2),
                   "lr_xyz_scale": round(float(
                       it / cfg.position_lr_max_steps), 3)}
            if bad_grads:
                row["nonfinite_grads_step"] = bad_grads
            if last_thr is not None:
                row["grad_thr"], row["densify_k"], row["live_target"] = \
                    last_thr
                last_thr = None
            if it % args.eval_every == 0 or it == args.iters:
                row["psnr_holdout"] = round(eval_psnr(), 2)
            emit(row)

    total_s = time.time() - t_start
    live = int(np.sum(np.asarray(state.params.live)))
    # steps/sec at the final plateau (the at-scale number for BENCH).
    tail = [ms for (_, lv, ms) in step_hist[-5:]]
    emit({"event": "summary", "mode": args.mode,
          "iters": args.iters, "total_wall_s": round(total_s, 1),
          "final_live": live, "final_capacity": state.params.capacity,
          "doublings": events["doubling"], "rejits": events["rejit"],
          "rejit_s": rejit_s, "pair_regrows": events["regrow"],
          "opacity_resets": events["opacity_reset"],
          "calibrations": events["calibrate"],
          "first_loss": round(first_loss, 5),
          "final_loss": round(loss_now, 5),
          "psnr_holdout_final": round(eval_psnr(), 2),
          "final_step_ms": tail and round(float(np.median(tail)), 1),
          "steps_per_sec_overall": round(args.iters / total_s, 2),
          "step_hist_tail": step_hist[-10:],
          "reached_1p5m": live >= 1_500_000})
    from multiview_inpaint_tpu.gs import gaussians as gply
    ply_path = args.out.rsplit(".", 1)[0] + "_final.ply"
    gply.save_ply(state.params, ply_path)
    emit({"event": "ply_saved", "path": ply_path, "rows": live})
    outf.close()


if __name__ == "__main__":
    main()
