"""Tests: PLY round trip, gaussian pytree, KNN init, OBB intersection."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.gs import gaussians, obb, ply_io, cameras
from multiview_inpaint_tpu.gs.gaussians import GaussianConfig
from multiview_inpaint_tpu.ops.knn import knn_mean_sq_dist


def _random_params(n=17, deg=0, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    m = (deg + 1) ** 2 - 1
    return gaussians.from_arrays(
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 1, 3)).astype(np.float32),
        rng.normal(size=(n, m, 3)).astype(np.float32),
        rng.normal(size=(n, 1)).astype(np.float32),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 4)).astype(np.float32),
        capacity=capacity,
    )


def test_ply_roundtrip(tmp_path):
    p = _random_params(n=17, deg=3)
    path = str(tmp_path / "point_cloud.ply")
    gaussians.save_ply(p, path)
    q = gaussians.load_ply(path, max_sh_degree=3)
    for field in ("xyz", "features_dc", "features_rest", "opacity",
                  "scaling", "rotation"):
        np.testing.assert_array_equal(np.asarray(getattr(p, field)),
                                      np.asarray(getattr(q, field)),
                                      err_msg=field)
    assert q.max_sh_degree == 3


def test_ply_padded_roundtrip(tmp_path):
    """Only live rows are written; loading yields exactly those."""
    p = _random_params(n=10, deg=0, capacity=32)
    path = str(tmp_path / "pc.ply")
    gaussians.save_ply(p, path)
    q = gaussians.load_ply(path, max_sh_degree=0)
    assert q.capacity == 10
    np.testing.assert_array_equal(np.asarray(q.xyz), np.asarray(p.xyz)[:10])


def test_ply_header_format(tmp_path):
    """Byte-level check of the header attribute order (the 3DGS contract)."""
    p = _random_params(n=4, deg=1)
    path = str(tmp_path / "pc.ply")
    gaussians.save_ply(p, path)
    header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    names = [l.split()[-1] for l in header.splitlines()
             if l.startswith("property")]
    expect = (["x", "y", "z", "nx", "ny", "nz"]
              + [f"f_dc_{i}" for i in range(3)]
              + [f"f_rest_{i}" for i in range(9)]
              + ["opacity"]
              + [f"scale_{i}" for i in range(3)]
              + [f"rot_{i}" for i in range(4)])
    assert names == expect
    assert "binary_little_endian" in header


def test_point_cloud_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = (rng.random((20, 3)) * 255).astype(np.float32)
    path = str(tmp_path / "points3d.ply")
    ply_io.store_point_cloud(path, xyz, rgb)
    pts, colors, normals = ply_io.fetch_point_cloud(path)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(colors * 255, np.clip(rgb, 0, 255).astype(np.uint8),
                               atol=0.5)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, chunk=16))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_create_from_pcd():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    colors = rng.random((30, 3)).astype(np.float32)
    p = gaussians.create_from_pcd(pts, colors, GaussianConfig(max_sh_degree=0),
                                  capacity=64)
    assert p.capacity == 64
    assert int(p.num_live()) == 30
    # opacity activation = 0.1 on live rows
    np.testing.assert_allclose(np.asarray(p.act_opacity())[:30], 0.1,
                               atol=1e-5)
    # dead rows composite at ~0 alpha
    assert np.all(np.asarray(p.act_opacity())[30:] < 1e-5)
    # colors roundtrip through SH DC
    from multiview_inpaint_tpu.utils import sh
    np.testing.assert_allclose(
        np.asarray(sh.sh_to_rgb(p.features_dc[:30, 0])), colors, atol=1e-5)


def _unit_obb():
    return obb.from_center_axes(np.zeros(3), np.eye(3, dtype=np.float32))


def test_obb_from_center_axes_geometry():
    box = _unit_obb()
    assert box.face_verts.shape == (12, 3, 3)
    np.testing.assert_allclose(box.center, 0.0, atol=1e-6)
    np.testing.assert_allclose(sorted(box.vertices[:, 0]),
                               [-0.5] * 4 + [0.5] * 4)


def test_obb_ray_intersect():
    box = _unit_obb()
    rayo = jnp.array([[0.0, 0, -5], [0, 0, -5], [2, 2, -5]])
    rayd = jnp.array([[0.0, 0, 1], [0, 1, 0], [0, 0, 1]])
    pts, t, hit = obb.intersect(box, rayo, rayd)
    assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
    assert float(t[0]) == pytest.approx(4.5, abs=1e-4)
    np.testing.assert_allclose(np.asarray(pts[0]), [0, 0, -0.5], atol=1e-4)


def test_obb_contains():
    box = _unit_obb()
    pts = jnp.array([[0.0, 0, 0], [0.49, 0.49, 0.49], [0.6, 0, 0],
                     [0, 0.51, 0]])
    inside = np.asarray(obb.contains(box, pts))
    assert list(inside) == [True, True, False, False]


def test_obb_sample_uniform_inside():
    box = _unit_obb()
    samples = obb.sample_uniform(box, jax.random.key(0), 500)
    inside = np.asarray(obb.contains(box, samples))
    assert inside.mean() > 0.99  # boundary-eps tolerance


def test_obb_obj_roundtrip(tmp_path):
    """Write a Blender-style cube OBJ, load it, verify axes span the box."""
    # Blender axes: our loader maps (x, y, z)obj -> (x, -z, y)world.
    verts = [(x, y, z) for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]
    quads = [(1, 2, 4, 3), (5, 7, 8, 6), (1, 5, 6, 2),
             (3, 4, 8, 7), (1, 3, 7, 5), (2, 6, 8, 4)]
    path = str(tmp_path / "box.obj")
    with open(path, "w") as f:
        f.write("# cube\n")
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for q in quads:
            f.write("f " + " ".join(f"{i}//1" for i in q) + "\n")
    box = obb.load_obb(path)
    assert box.vertices.shape == (8, 3)
    assert box.faces.shape == (12, 3)
    # Box spans [-1,1]^3 (after axis flip still a symmetric cube).
    np.testing.assert_allclose(np.abs(box.vertices).max(axis=0), 1.0)
    np.testing.assert_allclose(box.center, 0.0, atol=1e-6)
    # axes rows must be +-2 along coordinate axes and mutually orthogonal
    lens = np.linalg.norm(box.axes, axis=1)
    np.testing.assert_allclose(lens, 2.0, atol=1e-6)
    gram = box.axes @ box.axes.T
    np.testing.assert_allclose(gram - np.diag(np.diag(gram)), 0, atol=1e-6)
    # contains agrees
    inside = np.asarray(obb.contains(box, jnp.array([[0.0, 0, 0],
                                                     [1.5, 0, 0]])))
    assert list(inside) == [True, False]


def test_camera_and_rays():
    R = np.eye(3)
    T = np.array([0.0, 0, 5])
    cam = cameras.make_camera(0, R, T, fovx=0.8, fovy=0.6, width=64,
                              height=48)
    np.testing.assert_allclose(cam.camera_center, [0, 0, -5], atol=1e-5)
    o, d = cameras.get_rays(cam)
    assert o.shape == (64 * 48, 3) and d.shape == (64 * 48, 3)
    np.testing.assert_allclose(o[0], cam.camera_center, atol=1e-5)
    # central ray points along +z (camera looks along +z in this convention)
    center_idx = (48 // 2) * 64 + 64 // 2
    dn = d[center_idx] / np.linalg.norm(d[center_idx])
    np.testing.assert_allclose(dn, [0, 0, 1], atol=0.02)


def test_camera_retarget_keeps_focal():
    cam = cameras.make_camera(0, np.eye(3), np.zeros(3), fovx=0.8, fovy=0.6,
                              width=640, height=480)
    from multiview_inpaint_tpu.utils import graphics
    c2w = np.eye(4)
    c2w[:3, 3] = [1, 2, 3]
    cam2 = cameras.retarget(cam, c2w, width=512, height=384)
    f1 = graphics.fov2focal(cam.fovx, cam.width)
    f2 = graphics.fov2focal(cam2.fovx, cam2.width)
    assert f1 == pytest.approx(f2, rel=1e-6)
    np.testing.assert_allclose(cam2.camera_center, [1, 2, 3], atol=1e-5)
