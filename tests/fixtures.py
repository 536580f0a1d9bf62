"""Test fixtures: re-export the package synthetic-scene utilities."""

from multiview_inpaint_tpu.utils.synthetic import (  # noqa: F401
    make_colmap_scene, make_gt_gaussians, orbit_pose, write_cube_obj)
