"""OBB object deletion — reference ``gs-simp/del.py``.

Removes all gaussians inside the user-placed deletion box
(``bds/del/<scene>.obj``) from the iteration-30000 checkpoint and writes
``point_cloud/del/point_cloud.ply``. Point-in-box test = bidirectional
+-x ray hit, identical semantics to ``del.py:105-117``.

    python -m multiview_inpaint_tpu.pipelines.delete -m output/<scene> \
        --box bds/del/<scene>.obj
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..gs import gaussians as g_mod
from ..gs import obb as obb_mod


def delete_in_box(params, box, chunk: int = 65536):
    inside = []
    xyz = np.asarray(params.xyz)
    for i in range(0, len(xyz), chunk):
        inside.append(np.asarray(obb_mod.contains(
            box, jnp.asarray(xyz[i:i + chunk]))))
    inside = np.concatenate(inside)
    keep = np.asarray(params.live) & ~inside
    import dataclasses
    return dataclasses.replace(params, live=jnp.asarray(keep)), int(
        (np.asarray(params.live) & inside).sum())


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--box", required=True,
                        help="deletion OBB obj file")
    parser.add_argument("--iteration", type=int, default=30000)
    parser.add_argument("--sh_degree", type=int, default=0)
    args = parser.parse_args(argv)

    src = os.path.join(args.model_path, "point_cloud",
                       f"iteration_{args.iteration}", "point_cloud.ply")
    params = g_mod.load_ply(src, args.sh_degree)
    box = obb_mod.load_obb(args.box)
    params, n_removed = delete_in_box(params, box)
    dst = os.path.join(args.model_path, "point_cloud", "del",
                       "point_cloud.ply")
    g_mod.save_ply(params, dst)
    print(f"removed {n_removed} gaussians inside box; "
          f"{int(params.num_live())} remain -> {dst}")


if __name__ == "__main__":
    main()
