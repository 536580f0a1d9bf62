"""Depth hints for the coarse-model renders — reference ``gen_depth.py``.

The reference runs a monocular depth-estimation network (HF DPT) over the
coarse SDS model's orbit renders. TPU-native redesign: the coarse model's
**actual rendered depth** is available from our rasterizer, so the
default mode renders exact disparity maps from the ``output_sds`` model
(better-conditioned hints than monocular estimates, and no external
network). ``--from_est <dir>`` imports externally computed monocular
depth maps instead, preserving the reference's exact behavior when
desired.

Writes ``inpaint/depth/<scene_case>/<mode>/NN.png`` (3-channel
normalized disparity) — the control-hint depth consumed by the SVD
datasets.

    python -m multiview_inpaint_tpu.pipelines.gen_depth \
        --scene_id <scene>_<case> --sds_model output_sds/<scene>_<case> \
        -s dataset/<scene> -m output/<scene>
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from ..gs import gaussians as g_mod
from ..gs import obb as obb_mod
from ..gs import scene_io
from ..gs.scene import Scene, Workspace, orbit_cameras
from ..ops.rasterizer import DEPTH_EMPTY, RenderCamera, render
from . import common


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    common.add_registry_arg(parser)
    parser.add_argument("--scene_id", required=True)
    parser.add_argument("--sds_model", default=None,
                        help="coarse model dir (output_sds/<scene_case>)")
    parser.add_argument("--sds_iteration", type=int, default=5000)
    parser.add_argument("--from_est", default=None,
                        help="import external depth maps "
                             "(<mode>/NN.png) instead of rendering")
    parser.add_argument("--dpt_ckpt", default=None,
                        help="torch DPTForDepthEstimation checkpoint: "
                             "run the native monocular DPT head over the "
                             "coarse renders (the reference's exact "
                             "behavior — HF pipeline('depth-estimation'), "
                             "gen_depth.py:16-40) instead of exact "
                             "rendered disparity")
    parser.add_argument("--dpt_size", type=int, default=384,
                        help="DPT processor grid (HF default 384)")
    parser.add_argument("--modes", nargs="+", default=["x1", "x2"])
    parser.add_argument("--frames", type=int, default=14)
    parser.add_argument("--workspace", default=".")
    parser.add_argument("--inpaint_root", default="inpaint")
    common.add_backend_arg(parser)
    common.add_orbit_args(parser)
    args = parser.parse_args(argv)
    common.apply_registry(args)
    # fail fast on unknown scene ids (reference raises KeyError)
    orbit = common.resolve_orbit(args)

    ws = Workspace(args.workspace, args.inpaint_root)
    if args.from_est:
        for mode in args.modes:
            out_dir = ws.depth_dir(args.scene_id, mode)
            os.makedirs(out_dir, exist_ok=True)
            src = os.path.join(args.from_est, mode)
            for f in sorted(os.listdir(src)):
                shutil.copy(os.path.join(src, f),
                            os.path.join(out_dir, f))
            print(f"imported {mode} depth -> {out_dir}")
        return

    sds_model = args.sds_model or os.path.join("output_sds", args.scene_id)
    ply = os.path.join(sds_model, "point_cloud",
                       f"iteration_{args.sds_iteration}", "point_cloud.ply")
    params = g_mod.load_ply(ply, args.sh_degree)
    scene = Scene(args.source_path, args.model_path,
                  resolution=args.resolution, max_sh_degree=args.sh_degree,
                  shuffle=False, load_iteration=None, workspace=ws,
                  load_gaussians=False)
    scene.scene_name = args.scene_id
    box = obb_mod.load_obb(ws.bds_add(args.scene_id))
    front = scene.front_view()
    bg = common.default_background(args.white_background)
    import jax.numpy as jnp
    dpt = None
    if args.dpt_ckpt:
        from ..models.dpt import estimate_depth, load_dpt_torch
        _, dpt_model, dpt_params = load_dpt_torch(args.dpt_ckpt)
        dpt = lambda rgb: estimate_depth(  # noqa: E731
            dpt_model, dpt_params, rgb, proc_size=args.dpt_size)
    for mode in args.modes:
        views = orbit_cameras(
            front, box, mode=mode, frames=args.frames,
            view_range=orbit.view_range if orbit else np.pi / 3,
            r_scale=orbit.r_scale if orbit else 1.0,
            k_lift=orbit.k_lift if orbit else 0.0,
            k_bias=orbit.k_bias if orbit else 0.0)
        out_dir = ws.depth_dir(args.scene_id, mode)
        os.makedirs(out_dir, exist_ok=True)
        for view in views:
            out = render(params, RenderCamera.from_camera(view), bg,
                         sh_degree=args.sh_degree,
                         pair_budget=8 * params.capacity,
                         backend=common.resolve_backend(args.backend))
            if dpt is not None:
                disp = dpt(np.clip(np.asarray(out.rgb), 0.0, 1.0))
            else:
                depth = np.asarray(out.depth)
                disp = 1.0 / np.clip(depth, 0.1, None)
                disp[depth >= DEPTH_EMPTY - 1e-3] = 0.0
                if disp.max() > 0:
                    disp = disp / disp.max()
            scene_io.save_image(
                os.path.join(out_dir, f"{view.image_name}.png"),
                np.repeat(disp[..., None], 3, axis=-1))
        print(f"{mode}: {len(views)} depth hints -> {out_dir}")


if __name__ == "__main__":
    main()
