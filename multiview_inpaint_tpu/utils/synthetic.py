"""Synthetic toy scenes for demos, smoke tests and the e2e driver.

A tiny COLMAP dataset rendered from a known gaussian scene, exercising
the real loaders end to end (the reference ships no tiny dataset; this
replaces its reliance on real captures for quick verification).
"""


import os

import numpy as np
import jax.numpy as jnp

from multiview_inpaint_tpu.gs import colmap, gaussians, cameras, scene_io
from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
from multiview_inpaint_tpu.utils import sh as sh_utils
from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid


def make_gt_gaussians(n=32, seed=0, capacity=None, spread=0.8):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rgb = rng.random((n, 3)).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    return gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.85)))),
        np.full((n, 3), np.log(0.15), np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=capacity)


def orbit_pose(angle, radius=3.0, height=0.0):
    """(R, T) colmap-convention for a camera on a circle looking at origin."""
    pos = np.array([radius * np.sin(angle), height,
                    -radius * np.cos(angle)])
    z = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_c2w = np.stack([x, y, z], axis=1)
    w2c_R = R_c2w.T
    T = -w2c_R @ pos
    return R_c2w, T  # reference CameraInfo stores R = c2w rotation


def make_colmap_scene(root, n_views=6, width=64, height=48, n_points=300,
                      seed=0, fov=0.9):
    """Write sparse/0/*.bin + images/*.png rendered from gt gaussians."""
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    gt = make_gt_gaussians(seed=seed)

    from multiview_inpaint_tpu.utils import graphics
    fx = graphics.fov2focal(fov, width)
    fy = graphics.fov2focal(fov, height)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", width, height,
                                   np.array([fx, fy, width / 2,
                                             height / 2]))}
    images = {}
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views * 0.2 - 0.3
        R_c2w, T = orbit_pose(ang)
        qvec = colmap.rotmat2qvec(R_c2w.T)  # colmap stores w2c rotation
        name = f"view{i:02d}.png"
        images[i + 1] = colmap.ColmapImage(i + 1, qvec, T, 1, name)
        cam = cameras.make_camera(i, R_c2w, T,
                                  fovx=graphics.focal2fov(fx, width),
                                  fovy=graphics.focal2fov(fy, height),
                                  width=width, height=height)
        img = render(gt, RenderCamera.from_camera(cam), jnp.zeros(3),
                     max_per_tile=256, pair_budget=8 * gt.capacity).rgb
        scene_io.save_image(os.path.join(root, "images", name),
                            np.asarray(img))
    colmap.write_cameras_binary(cams, os.path.join(root, "sparse", "0",
                                                   "cameras.bin"))
    colmap.write_images_binary(images, os.path.join(root, "sparse", "0",
                                                    "images.bin"))
    rng = np.random.default_rng(seed)
    pts = np.asarray(gt.xyz)[rng.integers(0, gt.capacity, n_points)]
    pts = pts + rng.normal(scale=0.02, size=pts.shape)
    colmap.write_points3d_binary(pts, rng.random((n_points, 3)) * 255,
                                 os.path.join(root, "sparse", "0",
                                              "points3D.bin"))
    return gt


def write_cube_obj(path, center=(0, 0, 0), half=0.5):
    """Blender-convention cube OBJ (loader flips (x,y,z)->(x,-z,y))."""
    cx, cy, cz = center
    # world-space target corners: loader maps (x,y,z)obj -> (x,-z,y)
    # so write obj coords (x, z, -y) of desired world corners.
    corners = []
    for dx in (-half, half):
        for dy in (-half, half):
            for dz in (-half, half):
                wx, wy, wz = cx + dx, cy + dy, cz + dz
                corners.append((wx, wz, -wy))
    quads = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2),
             (3, 4, 8, 7), (1, 3, 7, 5), (2, 6, 8, 4)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# cube\n")
        for c in corners:
            f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        for q in quads:
            f.write("f " + " ".join(f"{i}//1" for i in q) + "\n")


def make_big_scene(n: int, seed: int = 0, scale_lo: float = 0.0015,
                   scale_hi: float = 0.008):
    """Reference-scale synthetic scene (1-6M gaussians): dense clustered
    foreground blobs + ground plane + far background shell, splat sizes
    small enough that pairs/gaussian stays realistic (~2-4 at 1080p vs
    the 100k bench ball's 12). Mirrors the composition of a densified
    Mip-360 capture (``gs-simp/scene/gaussian_model.py`` densify loop
    output: millions of small splats, most rects 1-4 tiles). Used by
    bench.py's scale row and scripts/bench_scale.py."""
    import jax.numpy as jnp
    import numpy as np

    from ..gs import gaussians
    from . import sh as sh_utils
    from .schedules import inverse_sigmoid

    rng = np.random.default_rng(seed)
    n_core = int(n * 0.55)
    n_plane = int(n * 0.25)
    n_shell = n - n_core - n_plane
    k = 40
    centers = rng.uniform(-1.2, 1.2, (k, 3)) * np.array([1, 1, 0.6])
    idx = rng.integers(0, k, n_core)
    core = centers[idx] + rng.normal(0, 0.25, (n_core, 3))
    plane = np.stack([rng.uniform(-3, 3, n_plane),
                      rng.uniform(-1.6, -1.4, n_plane),
                      rng.uniform(-3, 3, n_plane)], -1)
    r = rng.uniform(4.0, 6.0, n_shell)
    theta = rng.uniform(0, 2 * np.pi, n_shell)
    phi = np.arccos(rng.uniform(-1, 1, n_shell))
    shell = np.stack([r * np.sin(phi) * np.cos(theta),
                      r * np.sin(phi) * np.sin(theta),
                      r * np.cos(phi)], -1)
    xyz = np.concatenate([core, plane, shell]).astype(np.float32)
    rgb = (np.tanh(xyz * 0.4) * 0.5 + 0.5).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    scales[n_core + n_plane:] *= 4.0   # far shell: similar screen size
    op = rng.uniform(0.5, 0.95, (n, 1)).astype(np.float32)
    return gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.asarray(inverse_sigmoid(jnp.asarray(op))),
        np.log(scales),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
