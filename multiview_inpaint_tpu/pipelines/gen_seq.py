"""Orbit sequence + box masks generation — reference ``gen_seq.py``.

For each orbit mode (x1, x2) renders the 14-frame sequence around the
insertion OBB and writes the directory contract consumed by the multi-view
inpainting stage:

    inpaint/seq/<scene_case>/<mode>/ours_<iter>/
        renders/NN.png   masked/NN.png   mask/NN.png
        poses.npy (c2w per frame)   cam_center.npy (box center)

plus ``bds_train`` masks for the real training views. Mask semantics are
the reference's exactly (``gen_seq.py:50``): box is visible where the ray
hits it closer than the rendered surface, or the pixel is empty
(depth == 15 sentinel).

    python -m multiview_inpaint_tpu.pipelines.gen_seq \
        --scene_id <scene>_<case> -m output/<scene> -s dataset/<scene>
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..gs import obb as obb_mod
from ..gs import scene_io
from ..gs.cameras import get_rays
from ..gs.scene import Scene, Workspace, orbit_cameras
from ..ops.rasterizer import DEPTH_EMPTY, render_views
from . import common


def render_sequence(views, params, box, out_dir, bg, sh_degree=0,
                    max_per_tile=1024, pair_budget_mult=8,
                    save_poses=True, use_image_name=True,
                    backend="xla", mesh=None):
    os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masked"), exist_ok=True)
    poses = []
    kw = dict(sh_degree=sh_degree, max_per_tile=max_per_tile,
              pair_budget=pair_budget_mult * params.capacity,
              backend=backend)
    if mesh is not None and mesh.devices.size > 1:
        # Orbit views shard over the mesh's data axis (params
        # replicated, no collectives) — see parallel/render_parallel.
        from ..parallel.render_parallel import render_views_sharded
        outs = render_views_sharded(params, views, bg, mesh, **kw)
    else:
        # Per-view dispatch loop on one device — all views share the
        # same size, so the compiled program is reused.
        outs = render_views(params, views, bg, **kw)
    for idx, view in enumerate(views):
        v_id = view.image_name if use_image_name else f"{idx:02d}"
        poses.append(view.camera_to_world)
        out = jax.tree_util.tree_map(lambda x: x[idx], outs)
        rays_o, rays_d = get_rays(view)
        _, t, _ = obb_mod.intersect(box, jnp.asarray(rays_o),
                                    jnp.asarray(rays_d))
        t_img = np.asarray(t).reshape(view.height, view.width)
        depth = np.asarray(out.depth)
        mask = ((t_img > 0) & ((t_img < depth) | (depth == DEPTH_EMPTY))
                ).astype(np.float32)
        rgb = np.asarray(out.rgb)
        scene_io.save_image(os.path.join(out_dir, "renders",
                                         f"{v_id}.png"), rgb)
        scene_io.save_image(os.path.join(out_dir, "mask", f"{v_id}.png"),
                            mask)
        scene_io.save_image(os.path.join(out_dir, "masked", f"{v_id}.png"),
                            rgb * (1 - mask[..., None]) + mask[..., None])
    if save_poses:
        np.save(os.path.join(out_dir, "cam_center.npy"),
                np.asarray(box.center, np.float32)[None])
        np.save(os.path.join(out_dir, "poses.npy"),
                np.stack(poses).astype(np.float32))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("--scene_id", required=True,
                        help="<scene>_<case>")
    common.add_registry_arg(parser)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--workspace", default=".")
    parser.add_argument("--inpaint_root", default="inpaint",
                        help="inpaint hand-off dir (abs or relative to workspace)")
    parser.add_argument("--modes", nargs="+", default=["x1", "x2"])
    parser.add_argument("--frames", type=int, default=14)
    parser.add_argument("--sds", action="store_true",
                        help="render the coarse SDS model sequence "
                             "(reads output_sds, writes inpaint_sds)")
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--shard_views", action="store_true",
                        help="shard orbit views over all devices "
                             "(data-axis mesh, params replicated)")
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
    # model dir is output/<scene>; outputs keyed by <scene>_<case>
    scene.scene_name = args.scene_id
    iteration = scene.loaded_iteration or args.iteration
    box = obb_mod.load_obb(ws.bds_add(args.scene_id))
    bg = common.default_background(args.white_background)
    backend = common.resolve_backend(args.backend)
    mesh = None
    if args.shard_views:
        import jax

        from ..parallel import make_mesh
        if len(jax.devices()) > 1:
            mesh = make_mesh()
    front = scene.front_view()

    seq_root = "inpaint_sds" if args.sds else "inpaint"
    for mode in args.modes:
        views = orbit_cameras(
            front, box, mode=mode, frames=args.frames,
            view_range=orbit.view_range if orbit else np.pi / 3,
            r_scale=orbit.r_scale if orbit else 1.0,
            k_lift=orbit.k_lift if orbit else 0.0,
            k_bias=orbit.k_bias if orbit else 0.0)
        out_dir = os.path.join(args.workspace, seq_root, "seq",
                               args.scene_id, mode, f"ours_{iteration}")
        render_sequence(views, scene.gaussians, box, out_dir, bg,
                        sh_degree=args.sh_degree,
                        max_per_tile=args.max_per_tile,
                        use_image_name=True, backend=backend, mesh=mesh)
        print(f"mode {mode}: {len(views)} frames -> {out_dir}")

    if not args.sds:
        out_dir = os.path.join(args.workspace, "inpaint", "seq",
                               args.scene_id, "bds_train",
                               f"ours_{iteration}")
        render_sequence(scene.train_cameras(), scene.gaussians, box,
                        out_dir, bg, sh_degree=args.sh_degree,
                        max_per_tile=args.max_per_tile, save_poses=False,
                        use_image_name=True, backend=backend, mesh=mesh)
        print(f"bds_train masks -> {out_dir}")


if __name__ == "__main__":
    main()
