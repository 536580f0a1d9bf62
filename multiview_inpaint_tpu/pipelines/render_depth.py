"""Disparity rendering of orbit sequences — reference ``render_depth.py``.

Writes ``disp/NN.png`` (normalized 1/clamped-depth) next to the seq
renders, used for depth-hint debugging.

    python -m multiview_inpaint_tpu.pipelines.render_depth \
        --scene_id <scene>_<case> -m output/<scene> -s dataset/<scene>
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..gs import obb as obb_mod
from ..gs import scene_io
from ..gs.scene import Scene, Workspace, orbit_cameras
from ..ops.rasterizer import RenderCamera, render
from . import common


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("--scene_id", required=True)
    common.add_registry_arg(parser)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--workspace", default=".")
    parser.add_argument("--inpaint_root", default="inpaint",
                        help="inpaint hand-off dir (abs or relative to workspace)")
    parser.add_argument("--modes", nargs="+", default=["x1", "x2"])
    parser.add_argument("--frames", type=int, default=14)
    parser.add_argument("--shard_views", action="store_true",
                        help="shard orbit views over all devices "
                             "(params replicated)")
    common.add_backend_arg(parser)
    common.add_orbit_args(parser)
    args = parser.parse_args(argv)
    common.apply_registry(args)
    # fail fast on unknown scene ids (reference raises KeyError)
    orbit = common.resolve_orbit(args)

    ws = Workspace(args.workspace, args.inpaint_root)
    scene = Scene(args.source_path, args.model_path,
                  resolution=args.resolution, max_sh_degree=args.sh_degree,
                  shuffle=False, load_iteration=args.iteration,
                  workspace=ws)
    scene.scene_name = args.scene_id
    iteration = scene.loaded_iteration or args.iteration
    box = obb_mod.load_obb(ws.bds_add(args.scene_id))
    bg = common.default_background(args.white_background)
    front = scene.front_view()

    for mode in args.modes:
        views = orbit_cameras(
            front, box, mode=mode, frames=args.frames,
            view_range=orbit.view_range if orbit else np.pi / 3,
            r_scale=orbit.r_scale if orbit else 1.0,
            k_lift=orbit.k_lift if orbit else 0.0,
            k_bias=orbit.k_bias if orbit else 0.0)
        out_dir = os.path.join(args.workspace, "inpaint", "seq",
                               args.scene_id, mode, f"ours_{iteration}",
                               "disp")
        os.makedirs(out_dir, exist_ok=True)
        kw = dict(sh_degree=args.sh_degree,
                  pair_budget=8 * scene.gaussians.capacity,
                  backend=common.resolve_backend(args.backend))
        depths = None
        if args.shard_views:
            import jax
            if len(jax.devices()) > 1:
                from ..parallel import make_mesh
                from ..parallel.render_parallel import (
                    render_views_sharded)
                outs = render_views_sharded(
                    scene.gaussians, views, bg, make_mesh(), **kw)
                depths = [np.asarray(outs.depth[i])
                          for i in range(len(views))]
        for i, view in enumerate(views):
            d = (depths[i] if depths is not None else np.asarray(
                render(scene.gaussians, RenderCamera.from_camera(view),
                       bg, **kw).depth))
            disp = 1.0 / np.clip(d, 0.1, None)
            disp = disp / disp.max()
            scene_io.save_image(os.path.join(out_dir,
                                             f"{view.image_name}.png"),
                                disp)
        print(f"mode {mode}: disparity -> {out_dir}")


if __name__ == "__main__":
    main()
