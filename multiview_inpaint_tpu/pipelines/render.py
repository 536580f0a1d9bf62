"""Render train/test sets from a trained model — reference ``render.py``.

    python -m multiview_inpaint_tpu.pipelines.render -m output/<scene> \
        [--iteration N] [--skip_train] [--skip_test]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..gs import scene_io
from ..gs.scene import Scene
from ..ops.rasterizer import RenderCamera, render
from . import common


def render_set(model_path, name, iteration, views, params, bg,
               sh_degree, max_per_tile=1024, pair_budget_mult=8,
               save_depth=False, backend="xla", mesh=None):
    render_dir = os.path.join(model_path, name, f"ours_{iteration}",
                              "renders")
    gt_dir = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    kw = dict(sh_degree=sh_degree, max_per_tile=max_per_tile,
              pair_budget=pair_budget_mult * params.capacity,
              backend=backend)

    def one_view(view):
        return render(params, RenderCamera.from_camera(view), bg, **kw)

    outs = {}
    # FOV is a compiled-in static: same-size cameras with different
    # focals must fall back to the per-view loop.
    uniform = len({(v.width, v.height, v.tan_half_fovx,
                    v.tan_half_fovy) for v in views}) == 1
    if mesh is not None and mesh.devices.size > 1 and uniform:
        # Views shard over the data axis in mesh-size groups (one
        # compiled program reused; big train sets stay off one jit).
        from ..parallel.render_parallel import render_views_sharded
        d = mesh.devices.size
        for lo in range(0, len(views), d):
            group = views[lo:lo + d]
            out = render_views_sharded(params, group, bg, mesh, **kw)
            for j in range(len(group)):
                outs[lo + j] = jax.tree_util.tree_map(
                    lambda x, j=j: x[j], out)

    for idx, view in enumerate(views):
        out = outs[idx] if idx in outs else one_view(view)
        scene_io.save_image(os.path.join(render_dir, f"{idx:05d}.png"),
                            np.asarray(out.rgb))
        if view.image is not None:
            scene_io.save_image(os.path.join(gt_dir, f"{idx:05d}.png"),
                                view.image)
        if save_depth:
            depth_dir = os.path.join(model_path, name, f"ours_{iteration}",
                                     "depth")
            os.makedirs(depth_dir, exist_ok=True)
            disp = 1.0 / jnp.clip(out.depth, 0.1)
            scene_io.save_image(os.path.join(depth_dir, f"{idx:05d}.png"),
                                np.asarray(disp / disp.max()))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--save_depth", action="store_true")
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--shard_views", action="store_true",
                        help="shard view rendering over all devices "
                             "(uniform view sizes; params replicated)")
    common.add_backend_arg(parser)
    args = parser.parse_args(argv)
    args = common.load_cfg(args.model_path, args, set())

    scene = Scene(args.source_path, args.model_path,
                  resolution=args.resolution, eval_split=args.eval,
                  max_sh_degree=args.sh_degree, shuffle=False,
                  load_iteration=args.iteration)
    iteration = scene.loaded_iteration or args.iteration
    bg = common.default_background(args.white_background)
    backend = common.resolve_backend(args.backend)
    mesh = None
    if args.shard_views and len(jax.devices()) > 1:
        from ..parallel import make_mesh
        mesh = make_mesh()
    if not args.skip_train:
        render_set(args.model_path, "train", iteration,
                   scene.train_cameras(), scene.gaussians, bg,
                   args.sh_degree, args.max_per_tile,
                   save_depth=args.save_depth, backend=backend,
                   mesh=mesh)
    if not args.skip_test:
        render_set(args.model_path, "test", iteration,
                   scene.test_cameras(), scene.gaussians, bg,
                   args.sh_degree, args.max_per_tile,
                   save_depth=args.save_depth, backend=backend,
                   mesh=mesh)


if __name__ == "__main__":
    main()
