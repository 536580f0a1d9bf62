"""Stage-2 object reconstruction — reference ``gs-simp/inpaint_rec.py``.

Loads the del-background + 30k box-seeded gaussians (``load_sd_ply``),
trains 30k iters against the multi-view-inpainted orbit frames
(full-image L1+SSIM) and the original training views (background-masked
loss), with the stage-1 densification schedule. Output:
``output_rec/<scene>_<case>/ctrl_<k>/point_cloud/iteration_N/...``.

    python -m multiview_inpaint_tpu.pipelines.inpaint_rec \
        --scene_id <scene>_<case> --ctrl_id K -s dataset/<scene> \
        -m output_rec/<scene>_<case> --bg_model output/<scene>
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import jax.numpy as jnp

from ..gs import obb as obb_mod
from ..gs import scene as scene_mod
from ..gs.scene import Scene, Workspace
from ..models import gs_trainer
from ..ops.rasterizer import RenderCamera
from ..utils.logging import RunLogger
from . import common


def train(args):
    ws = Workspace(args.workspace, args.inpaint_root)
    scene = Scene(args.source_path, args.bg_model,
                  resolution=args.resolution, max_sh_degree=args.sh_degree,
                  shuffle=False, load_iteration=None, workspace=ws,
                  load_gaussians=False)
    scene.scene_name = args.scene_id
    box = obb_mod.load_obb(ws.bds_add(args.scene_id))
    del_ply = os.path.join(args.bg_model, "point_cloud", "del",
                           "point_cloud.ply")
    params = scene_mod.load_sd_ply(del_ply, box, n_samples=args.n_samples,
                                  max_sh_degree=args.sh_degree)
    cams = scene_mod.inpaint_train_cameras(
        scene, n_mode=args.n_mode, ctrl_id=args.ctrl_id,
        frames=args.frames, iteration=args.bg_iteration)
    if not cams:
        raise SystemExit("no inpaint training cameras found — run gen_seq "
                         "and svd_test first")

    out_dir = os.path.join(args.model_path, f"ctrl_{args.ctrl_id}")
    os.makedirs(out_dir, exist_ok=True)
    logger = RunLogger(out_dir)
    cfg = common.optimization_config_from(args)
    state = gs_trainer.init_state(params)
    bg = common.default_background(args.white_background)
    key = jax.random.key(0)
    rng = random.Random(0)
    stack = []
    if args.backend == "auto":
        args.backend = ("pallas" if jax.default_backend() not in
                        ("cpu",) else "xla")
        logger.echo(f"rasterizer backend: {args.backend}")
    pair_mult = args.pair_budget_mult
    for iteration in range(1, cfg.iterations + 1):
        if not stack:
            stack = list(cams)
            rng.shuffle(stack)
        cam = stack.pop()
        rcam = RenderCamera.from_camera(cam)
        gt = jnp.asarray(cam.image)
        if cam.inpainted:
            state, metrics = gs_trainer.train_step(
                state, rcam, gt, bg, cfg,
                spatial_lr_scale=scene.cameras_extent,
                sh_degree=args.sh_degree, loss_mode="full",
                max_per_tile=args.max_per_tile,
                pair_budget_mult=pair_mult, backend=args.backend)
        else:
            state, metrics = gs_trainer.train_step(
                state, rcam, gt, bg, cfg,
                spatial_lr_scale=scene.cameras_extent,
                sh_degree=args.sh_degree,
                mask=jnp.asarray(cam.mask), loss_mode="background",
                max_per_tile=args.max_per_tile,
                pair_budget_mult=pair_mult, backend=args.backend)
        key, sub = jax.random.split(key)
        state, info = gs_trainer.maybe_densify(state, sub, cfg,
                                               scene.cameras_extent,
                                               iteration)
        state = gs_trainer.grow_if_needed(state, info)
        if iteration % args.log_interval == 0:
            pairs = int(metrics.pairs)
            if pairs > 0.85 * pair_mult * state.params.capacity:
                pair_mult *= 2
                logger.echo(f"[ITER {iteration}] pair budget -> "
                            f"{pair_mult}x capacity")
            logger.log(iteration, loss=metrics.loss, pairs=pairs,
                       points=int(metrics.num_live), **(info or {}))
        if iteration in args.save_iterations:
            from ..gs import gaussians as g_mod
            path = os.path.join(out_dir, "point_cloud",
                                f"iteration_{iteration}",
                                "point_cloud.ply")
            g_mod.save_ply(state.params, path)
            logger.echo(f"[ITER {iteration}] saved {path}")
    logger.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    common.add_optimization_args(parser)
    common.add_registry_arg(parser)
    parser.add_argument("--scene_id", required=True)
    parser.add_argument("--ctrl_id", type=int, default=-1)
    parser.add_argument("--bg_model", required=True,
                        help="stage-1 model dir (output/<scene>)")
    parser.add_argument("--bg_iteration", type=int, default=30000)
    parser.add_argument("--workspace", default=".")
    parser.add_argument("--inpaint_root", default="inpaint",
                        help="inpaint hand-off dir (abs or relative to workspace)")
    parser.add_argument("--n_mode", type=int, default=2)
    parser.add_argument("--frames", type=int, default=14)
    parser.add_argument("--n_samples", type=int, default=30000)
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--pair_budget_mult", type=int, default=4)
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--log_interval", type=int, default=100)
    args = parser.parse_args(argv)
    common.apply_registry(args)
    if args.iterations not in args.save_iterations:
        args.save_iterations = list(args.save_iterations) + [args.iterations]
    train(args)


if __name__ == "__main__":
    main()
