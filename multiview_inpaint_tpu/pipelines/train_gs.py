"""Background GS reconstruction CLI — reference ``gs-simp/train.py``.

    python -m multiview_inpaint_tpu.pipelines.train_gs \
        -s dataset/<scene> [-m output/<scene>] [--iterations 30000] ...

Differences from the reference are TPU-idiomatic, not behavioral: the
training step is one jitted function; densification edits fixed-capacity
buffers (capacity doubles on pressure instead of reallocating); checkpoints
are PLY (inter-stage contract, ``--save_iterations``) plus full-state npz
(``--checkpoint_iterations`` / ``--start_checkpoint``).
"""

from __future__ import annotations

import argparse
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..gs import checkpoint as ckpt_mod
from ..gs.scene import Scene
from ..models import gs_trainer
from ..ops.rasterizer import RenderCamera, render
from ..utils import losses as loss_utils
from ..utils.logging import RunLogger
from . import common


def train(args) -> None:
    logger = None
    model_path = args.model_path or os.path.join(
        "./output", os.path.basename(args.source_path.rstrip("/")))
    args.model_path = model_path
    os.makedirs(model_path, exist_ok=True)
    common.dump_cfg(model_path, args)
    logger = RunLogger(model_path)

    if args.backend == "auto":
        args.backend = ("pallas" if jax.default_backend() not in
                        ("cpu",) else "xla")
        logger.echo(f"rasterizer backend: {args.backend}")

    scene = Scene(args.source_path, model_path, resolution=args.resolution,
                  eval_split=args.eval, max_sh_degree=args.sh_degree,
                  white_background=args.white_background,
                  capacity=args.capacity, seed=0)
    cfg = common.optimization_config_from(args)
    bg = common.default_background(args.white_background)

    if args.start_checkpoint:
        state = ckpt_mod.load_train_state(args.start_checkpoint)
        first_iter = int(state.step)
    else:
        state = gs_trainer.init_state(scene.gaussians)
        first_iter = 0

    live = None
    if args.live_view:
        from ..utils.live_view import LiveViewServer
        live = LiveViewServer(args.live_view)
        logger.echo(f"live view: http://localhost:{live.port}/")

    spatial = scene.cameras_extent
    rng = random.Random(0)
    key = jax.random.key(0)
    sh_degree = 0  # raised every 1000 iters up to max (oneupSHdegree)
    stack = []
    t_start = time.time()
    pair_mult = args.pair_budget_mult
    expand_window = args.expand_window
    for iteration in range(first_iter + 1, cfg.iterations + 1):
        if not stack:
            stack = list(scene.train_cameras())
            rng.shuffle(stack)
        cam = stack.pop()
        if args.profile_dir and iteration == 100:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and iteration == 110:
            jax.profiler.stop_trace()
            logger.echo(f"profiler trace -> {args.profile_dir}")
        if iteration % 1000 == 0:
            sh_degree = min(sh_degree + 1, args.sh_degree)
        rcam = RenderCamera.from_camera(cam)
        gt = jnp.asarray(cam.image)
        state, metrics = gs_trainer.train_step(
            state, rcam, gt, bg, cfg, spatial_lr_scale=spatial,
            sh_degree=sh_degree, max_per_tile=args.max_per_tile,
            pair_budget_mult=pair_mult,
            backend=args.backend, expand_window=expand_window)
        key, sub = jax.random.split(key)
        state, info = gs_trainer.maybe_densify(state, sub, cfg, spatial,
                                               iteration)
        state = gs_trainer.grow_if_needed(state, info)

        if live is not None and iteration % args.live_interval == 0:
            pose = live.requested_pose()
            view_cam = cam
            if pose:
                import math as _m

                from ..gs.cameras import retarget
                yaw = _m.radians(pose.get("yaw", 0.0))
                pitch = _m.radians(pose.get("pitch", 0.0))
                radius = pose.get("radius", 1.0) * spatial
                c = np.array([radius * _m.cos(pitch) * _m.sin(yaw),
                              radius * _m.sin(pitch),
                              -radius * _m.cos(pitch) * _m.cos(yaw)])
                z = -c / (np.linalg.norm(c) + 1e-9)
                up = np.array([0.0, 1.0, 0.0])
                x = np.cross(up, z)
                x = x / (np.linalg.norm(x) + 1e-9)
                y = np.cross(z, x)
                c2w = np.eye(4)
                c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, c
                view_cam = retarget(cam, c2w, inpainted=False)
            out = render(state.params, RenderCamera.from_camera(view_cam),
                         bg, sh_degree=sh_degree,
                         max_per_tile=args.max_per_tile,
                         pair_budget=int(args.pair_budget_mult
                                         * state.params.capacity))
            live.publish(np.asarray(out.rgb))
        if iteration % args.log_interval == 0:
            # Adaptive pair budget: like the CUDA reference's exact
            # num_rendered allocation, but with a static-shape doubling
            # schedule (re-jits the step, so only checked at host syncs).
            pairs = int(metrics.pairs)
            if pairs > 0.85 * pair_mult * state.params.capacity:
                pair_mult *= 2
                args.pair_budget_mult = pair_mult  # eval/live renders too
                logger.echo(f"[ITER {iteration}] pair budget -> "
                            f"{pair_mult}x capacity ({pairs} pairs seen)")
            if expand_window:
                # Tightened expansion window (opt-in): grow before the
                # measured need reaches it (re-jit, like the budget).
                need = int(metrics.expand_needed)
                if need > expand_window - 16:
                    expand_window = -(-(need + 64) // 16) * 16
                    logger.echo(f"[ITER {iteration}] expand window -> "
                                f"{expand_window} (need {need})")
            logger.log(iteration, loss=metrics.loss, l1=metrics.l1,
                       points=int(metrics.num_live),
                       capacity=state.params.capacity, pairs=pairs,
                       it_per_s=args.log_interval / max(
                           time.time() - t_start, 1e-9), **(info or {}))
            t_start = time.time()
        if iteration in args.test_iterations:
            _report(scene, state, bg, sh_degree, iteration, logger, args)
        if iteration in args.save_iterations:
            path = scene.save(state.params, iteration)
            logger.echo(f"[ITER {iteration}] saved {path}")
        if iteration in args.checkpoint_iterations:
            p = os.path.join(model_path, f"chkpnt{iteration}.npz")
            ckpt_mod.save_train_state(p, state)
            logger.echo(f"[ITER {iteration}] checkpoint {p}")
    logger.close()


def _report(scene, state, bg, sh_degree, iteration, logger, args):
    for split, cams in (("test", scene.test_cameras()),
                        ("train", scene.train_cameras()[:5])):
        if not cams:
            continue
        psnrs, l1s = [], []
        for cam in cams:
            out = render(state.params, RenderCamera.from_camera(cam), bg,
                         sh_degree=sh_degree,
                         max_per_tile=args.max_per_tile,
                         pair_budget=int(args.pair_budget_mult
                                         * state.params.capacity))
            pred = jnp.clip(out.rgb, 0, 1)
            gt = jnp.asarray(cam.image)
            l1s.append(float(loss_utils.l1_loss(pred, gt)))
            psnrs.append(float(loss_utils.psnr(
                jnp.transpose(pred, (2, 0, 1))[None],
                jnp.transpose(gt, (2, 0, 1))[None])[0, 0, 0, 0]))
        logger.log(iteration, split=split, psnr=np.mean(psnrs),
                   eval_l1=np.mean(l1s))
        logger.echo(f"[ITER {iteration}] {split}: "
                    f"L1 {np.mean(l1s):.4f} PSNR {np.mean(psnrs):.2f}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    common.add_optimization_args(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--capacity", type=int, default=None)
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--pair_budget_mult", type=float, default=4,
                        help="pair budget as a (fractional) multiple of "
                             "capacity; every budgeted slot rides the "
                             "sort/gathers, so tight beats round")
    parser.add_argument("--expand_window", type=int, default=0,
                        help="pair-expansion window (pallas backend): "
                             "0 = worst-case 288 (always exact); a "
                             "tight value (e.g. 128) cuts the expansion "
                             "kernel's MXU cycles ~P*window/128 and "
                             "auto-grows at log intervals when the "
                             "measured need approaches it")
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="rasterizer backend (pallas = fused TPU "
                             "kernels; xla = portable path; auto picks "
                             "pallas on TPU)")
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--live_view", type=int, default=0,
                        help="serve a browser live view on this port")
    parser.add_argument("--live_interval", type=int, default=50)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of iterations "
                             "100-110 to this directory")
    args = parser.parse_args(argv)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    if not args.save_iterations or args.iterations not in args.save_iterations:
        args.save_iterations = list(args.save_iterations) + [args.iterations]
    train(args)


if __name__ == "__main__":
    main()
