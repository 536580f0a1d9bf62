"""Scene layer tests: COLMAP round trip, Scene manager, orbit synthesis."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.gs import colmap, gaussians, obb, scene as scene_mod
from multiview_inpaint_tpu.gs.scene import Scene, Workspace, orbit_cameras
from multiview_inpaint_tpu.config.registries import FRONT_VIEWS

import fixtures


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 480.0, 320.0, 240.0]))}
    q = np.array([0.9, 0.1, -0.2, 0.3])
    q /= np.linalg.norm(q)
    imgs = {5: colmap.ColmapImage(5, q, np.array([0.1, 0.2, 0.3]), 1,
                                  "img.png")}
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    colmap.write_images_binary(imgs, str(tmp_path / "images.bin"))
    xyz = np.random.default_rng(0).normal(size=(10, 3))
    rgb = np.random.default_rng(1).random((10, 3)) * 255
    colmap.write_points3d_binary(xyz, rgb, str(tmp_path / "points3D.bin"))

    c2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    i2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
    assert i2[5].name == "img.png"
    np.testing.assert_allclose(i2[5].qvec, q)
    p_xyz, p_rgb, _ = colmap.read_points3d_binary(str(tmp_path /
                                                     "points3D.bin"))
    np.testing.assert_allclose(p_xyz, xyz)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-6)


def test_scene_load(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src)
    sc = Scene(src, str(tmp_path / "output" / "toy"), resolution=1,
               shuffle=False)
    assert len(sc.train_cameras()) == 6
    assert sc.cameras_extent > 0
    assert int(sc.gaussians.num_live()) == 300
    cam = sc.train_cameras()[0]
    assert cam.image is not None and cam.image.shape == (48, 64, 3)
    assert os.path.exists(str(tmp_path / "output" / "toy" / "cameras.json"))


def test_scene_eval_split(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src, n_views=8)
    sc = Scene(src, str(tmp_path / "out" / "toy"), resolution=1,
               eval_split=True, shuffle=False)
    assert len(sc.test_cameras()) == 1  # every 8th
    assert len(sc.train_cameras()) == 7


def test_scene_checkpoint_cascade(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src)
    model = str(tmp_path / "out" / "toy")
    sc = Scene(src, model, resolution=1, shuffle=False)
    sc.save(sc.gaussians, 77)
    # iteration cascade
    sc2 = Scene(src, model, resolution=1, shuffle=False, load_iteration=-1)
    assert sc2.loaded_iteration == 77
    # del cascade takes precedence
    gaussians.save_ply(sc.gaussians,
                       os.path.join(model, "point_cloud", "del",
                                    "point_cloud.ply"))
    sc3 = Scene(src, model, resolution=1, shuffle=False, load_iteration=-1)
    assert sc3.loaded_iteration is None


def test_orbit_cameras_geometry(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src)
    sc = Scene(src, str(tmp_path / "out" / "toy"), resolution=1,
               shuffle=False)
    front = sc.train_cameras()[0]
    box = obb.from_center_axes(np.array([0.0, 0, 0]),
                               np.eye(3, dtype=np.float32) * 0.6)
    views = orbit_cameras(front, box, mode="x1", frames=14, r_scale=0.8,
                          new_size=(512, 384))
    assert len(views) == 14
    for v in views:
        assert (v.width, v.height) == (384, 512)
        # each camera looks at the box center: z axis of c2w points at it
        c2w = v.camera_to_world
        to_center = box.center - c2w[:3, 3]
        to_center /= np.linalg.norm(to_center)
        np.testing.assert_allclose(c2w[:3, 2], to_center, atol=1e-5)
        # distance = r_scale * front distance
        d = np.linalg.norm(box.center - c2w[:3, 3])
        d_front = np.linalg.norm(box.center - front.camera_center) * 0.8
        assert d == pytest.approx(d_front, rel=1e-4)
    # x1 and x2 sweep opposite directions: frame 1 positions differ
    views2 = orbit_cameras(front, box, mode="x2", frames=14, r_scale=0.8)
    assert not np.allclose(views[1].camera_center, views2[1].camera_center)
    # frame 0 of both modes coincide (angle 0)
    np.testing.assert_allclose(views[0].camera_center,
                               views2[0].camera_center, atol=1e-5)


def test_orbit_focal_preserved(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src)
    sc = Scene(src, str(tmp_path / "out" / "toy"), resolution=1,
               shuffle=False)
    front = sc.train_cameras()[0]
    box = obb.from_center_axes(np.zeros(3), np.eye(3, dtype=np.float32))
    from multiview_inpaint_tpu.utils import graphics
    v = orbit_cameras(front, box, new_size=(512, 384))[0]
    assert graphics.fov2focal(v.fovx, v.width) == pytest.approx(
        graphics.fov2focal(front.fovx, front.width), rel=1e-6)


def test_load_sd_ply(tmp_path):
    gt = fixtures.make_gt_gaussians(n=20)
    ply = str(tmp_path / "del" / "point_cloud.ply")
    gaussians.save_ply(gt, ply)
    box = obb.from_center_axes(np.array([2.0, 0, 0]),
                               np.eye(3, dtype=np.float32) * 0.4)
    p = scene_mod.load_sd_ply(ply, box, n_samples=500, capacity=1024)
    assert int(p.num_live()) == 520
    new_xyz = np.asarray(p.xyz)[20:520]
    inside = np.asarray(obb.contains(box, jnp.asarray(new_xyz)))
    assert inside.mean() > 0.99
    # new gaussians are gray (zero SH dc) with opacity 0.1
    np.testing.assert_allclose(np.asarray(p.features_dc)[20:520], 0.0)
    np.testing.assert_allclose(np.asarray(p.act_opacity())[20:520], 0.1,
                               rtol=1e-4)
    # bg rows byte-identical
    np.testing.assert_array_equal(np.asarray(p.xyz)[:20],
                                  np.asarray(gt.xyz)[:20])


def test_front_view_lookup(tmp_path):
    src = str(tmp_path / "data")
    fixtures.make_colmap_scene(src)
    sc = Scene(src, str(tmp_path / "out" / "toy_case"), resolution=1,
               shuffle=False)
    FRONT_VIEWS["toy"] = "view02"
    try:
        assert sc.front_view().image_name == "view02"
    finally:
        del FRONT_VIEWS["toy"]
