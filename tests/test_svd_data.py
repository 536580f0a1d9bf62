"""SVD data-layer parity tests: mask-shrink aug, pose conditioning,
warp-consistency dataset + the dp train step with the warp term.

Reference behaviors: ``process_mask`` (my_dataset.py:2993-3024),
``compute_poses`` (:19-95), ``SVDForwardLeastDataset3`` (:1954-2099).
"""

import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from multiview_inpaint_tpu.data.svd_dataset import (EstSVDForwardDataset,
                                                    WarpSVDForwardDataset,
                                                    compute_poses,
                                                    compute_poses2,
                                                    process_mask)


# --- process_mask ---------------------------------------------------------

def test_process_mask_shrinks_within_bbox():
    mask = np.zeros((40, 60), np.float32)
    mask[10:30, 20:50] = 1.0
    rng = random.Random(0)
    for _ in range(20):
        out = process_mask(mask, k_max=0.4, rng=rng)
        rows = np.argwhere(out.max(axis=1) > 0)
        cols = np.argwhere(out.max(axis=0) > 0)
        # stays a filled rectangle inside the original bbox
        assert rows.min() >= 10 and rows.max() <= 29
        assert cols.min() >= 20 and cols.max() <= 49
        r0, r1 = int(rows.min()), int(rows.max()) + 1
        c0, c1 = int(cols.min()), int(cols.max()) + 1
        assert out[r0:r1, c0:c1].min() == 1.0
        assert out.sum() == (r1 - r0) * (c1 - c0)
        # each side shaved strictly less than k_max of the extent
        assert r0 - 10 < 0.4 * 20 and 30 - r1 < 0.4 * 20
        assert c0 - 20 < 0.4 * 30 and 50 - c1 < 0.4 * 30


def test_process_mask_kmax_zero_is_bbox_fill():
    mask = np.zeros((16, 16), np.float32)
    mask[3:7, 5:9] = 1.0
    out = process_mask(mask, k_max=0.0, rng=random.Random(1))
    expect = np.zeros_like(mask)
    expect[3:7, 5:9] = 1.0
    np.testing.assert_array_equal(out, expect)


def test_process_mask_empty_returns_none():
    assert process_mask(np.zeros((8, 8), np.float32)) is None


def test_process_mask_3d_input_collapses_channels():
    mask = np.zeros((16, 16, 3), np.float32)
    mask[4:10, 2:12, 1] = 1.0
    out = process_mask(mask, k_max=0.0, rng=random.Random(0))
    assert out.shape == (16, 16)
    assert out[4:10, 2:12].min() == 1.0


# --- compute_poses --------------------------------------------------------

def _orbit_c2w(angles, radius=2.0, lift=0.0, center=(0.0, 0.0, 0.0)):
    """Camera-to-world poses on a circle looking at center (y up)."""
    poses = []
    c = np.asarray(center, np.float64)
    for a in angles:
        pos = c + np.array([radius * np.sin(a), lift,
                            radius * np.cos(a)])
        z = c - pos
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, pos
        poses.append(m)
    return np.stack(poses)


def test_compute_poses_recovers_orbit_azimuths():
    angles = np.linspace(0, np.pi / 2, 8)
    poses = _orbit_c2w(angles)
    az, po, rad = compute_poses(poses, cam_center=np.zeros((1, 3)))
    # azimuths are relative to frame 0 and should recover the angular
    # steps (up to sign convention)
    steps = np.abs(az)
    np.testing.assert_allclose(steps, angles, atol=1e-6)
    # constant radius -> scaled radius 0, flat orbit -> constant polar
    np.testing.assert_allclose(rad, 0.0, atol=1e-9)
    np.testing.assert_allclose(po - po[0], 0.0, atol=1e-6)
    assert float(az[0]) == 0.0


def test_compute_poses_radius_scaling():
    angles = np.zeros(3)
    poses = _orbit_c2w(angles)
    poses[1, :3, 3] *= 1.5
    poses[2, :3, 3] *= 0.5
    _, _, rad = compute_poses(poses, cam_center=np.zeros((1, 3)))
    np.testing.assert_allclose(rad, [0.0, 0.5, -0.5], atol=1e-9)


def test_compute_poses2_ranges():
    angles = np.linspace(-np.pi / 3, np.pi / 3, 6)
    poses = _orbit_c2w(angles, lift=0.7)
    az, po, _ = compute_poses2(poses, cam_center=np.zeros((1, 3)))
    assert np.all(az >= 0) and np.all(az < 2 * np.pi)
    assert np.all(po >= 0) and np.all(po < np.pi)


# --- dataset fixtures -----------------------------------------------------

H, W, T = 32, 24, 3


def _write_scene(root, with_depth=False, with_poses=False, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "masks"))
    os.makedirs(os.path.join(root, "est_depth"), exist_ok=True)
    if with_depth:
        os.makedirs(os.path.join(root, "depth"))
    for i in range(T):
        v = f"{i:05d}"
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)
                        ).save(f"{root}/rgb/{v}.png")
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)
                        ).save(f"{root}/est_depth/{v}.png")
        m = np.zeros((H, W), np.uint8)
        m[8:24, 6:18] = 255
        Image.fromarray(m).save(f"{root}/masks/{v}.png")
        if with_depth:
            d = np.full((H, W), 2000, np.uint16)  # 2 m
            Image.fromarray(d).save(f"{root}/depth/{v}.png")
    if with_poses or with_depth:
        poses = _orbit_c2w(np.linspace(0, 0.3, T), radius=2.0)
        np.save(os.path.join(root, "poses.npy"), poses.astype(np.float32))
    if with_depth:
        K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]])
        with open(os.path.join(root, "metadata"), "w") as f:
            # column-major storage, like the reference metadata
            json.dump({"w": W, "h": H,
                       "K": list(K.T.reshape(-1))}, f)


def test_est_dataset_mask_shrink_and_pose_cond(tmp_path):
    _write_scene(str(tmp_path / "000000000"), with_poses=True)
    ds = EstSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                              mask_shrink_k=0.4, pose_cond=True, seed=3)
    b = ds[0]
    assert b["jpg"].shape == (T, H, W, 3)
    for k in ("azimuths_rad", "polars_rad", "rad"):
        assert b[k].shape == (T,)
    # shrunk mask is strictly inside the drawn 16x12 box for some draw
    areas = {float(ds[0]["masks"][0].sum()) for _ in range(8)}
    assert min(areas) < 16 * 12
    assert max(areas) <= 16 * 12


def test_warp_dataset_contract(tmp_path):
    _write_scene(str(tmp_path / "000000000"), with_depth=True)
    ds = WarpSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                               train=False, seed=0)
    b = ds[0]
    h8, w8 = H // 8, W // 8
    assert b["control_hint"].shape == (T, H, W, 3)  # frames-only hint
    assert b["hit_map"].shape == (T - 1, h8, w8)
    assert b["uv_ind"].shape == (T - 1, 4, h8 * w8)
    assert b["uv_ind"].dtype == np.int32
    assert set(np.unique(b["hit_map"])) <= {0.0, 1.0}
    # small orbit at 2m depth: most latent pixels reproject on-screen
    assert b["hit_map"].mean() > 0.5


def test_warp_dataset_static_camera_identity(tmp_path):
    root = str(tmp_path / "000000000")
    _write_scene(root, with_depth=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    np.save(os.path.join(root, "poses.npy"), poses)
    ds = WarpSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                               train=False, seed=1)
    b = ds[0]
    h8, w8 = H // 8, W // 8
    np.testing.assert_array_equal(b["hit_map"], 1.0)
    for f in range(T - 1):
        np.testing.assert_array_equal(b["uv_ind"][f, 0],
                                      np.arange(h8 * w8))


# --- warp term through the dp train step ----------------------------------

def test_dp_train_step_with_warp():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.diffusion.clip_vit import TINY_VIT
    from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                        SVDEngine,
                                                        init_engine)
    from multiview_inpaint_tpu.diffusion.unet import UNetConfig
    from multiview_inpaint_tpu.diffusion.vae import VAEConfig
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.svd_data_parallel import (
        build_optimizer, make_dp_train_step, replicate_state,
        shard_svd_batch, trainable_params)

    t, hw = 2, 8
    cfg = EngineConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        attention_resolutions=(1,), channel_mult=(1, 2),
                        num_head_channels=16, context_dim=16),
        vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        vit=dc.replace(TINY_VIT, output_dim=16), num_frames=t,
        hint_channels=3)
    eng = SVDEngine(cfg)
    est = init_engine(cfg, jax.random.key(0), latent_hw=(hw, hw))
    optimizer = build_optimizer(lr=1e-4)
    opt_state = optimizer.init(trainable_params(est))
    step = make_dp_train_step(eng, optimizer, use_warp=True)

    n_dev = 2
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    b = n_dev
    latents_b = jnp.asarray(rng.normal(size=(b, t, hw, hw, 4)),
                            jnp.float32)
    cond_b = {
        "concat": jnp.asarray(rng.normal(size=(b, t, hw, hw, 4)),
                              jnp.float32),
        "crossattn": jnp.asarray(rng.normal(size=(b, t, 1, 16)),
                                 jnp.float32),
        "vector": jnp.asarray(rng.normal(size=(b, t, 768)), jnp.float32),
        "control_hint": jnp.asarray(
            rng.normal(size=(b, t, hw * 8, hw * 8, 3)), jnp.float32),
        "hit_map": jnp.ones((b, t - 1, hw, hw), jnp.float32),
        "uv_ind": jnp.tile(jnp.arange(hw * hw, dtype=jnp.int32),
                           (b, t - 1, 4, 1)),
    }
    with mesh:
        est_r = replicate_state(est, mesh)
        opt_r = replicate_state(opt_state, mesh)
        # copy: the dp step donates state AND ema — aliased leaves would
        # donate the same buffer twice
        ema_r = replicate_state(jax.tree_util.tree_map(
            jnp.copy, trainable_params(est)), mesh)
        latents_b, cond_b = shard_svd_batch(latents_b, cond_b, mesh)
        _, _, _, loss = step(est_r, opt_r, ema_r, jax.random.key(1),
                             latents_b, cond_b)
    assert np.isfinite(float(loss))


def test_conditioner_pose_vector_keys():
    import jax.numpy as jnp

    from multiview_inpaint_tpu.diffusion.conditioners import (
        Conditioner, ConditionerConfig)

    t = 4
    cfg = ConditionerConfig(
        embed_dim=16,
        vector_keys=("fps_id", "motion_bucket_id", "cond_aug",
                     "polars_rad", "azimuths_rad", "rad"))
    cond = Conditioner(
        clip_embed=lambda f: jnp.zeros((f.shape[0], 8)),
        vae_encode_mode=lambda f: jnp.zeros((f.shape[0], 2, 2, 4)),
        cfg=cfg)
    batch = {
        "cond_frames_without_noise": jnp.zeros((1, 16, 16, 3)),
        "cond_frames": jnp.zeros((1, 16, 16, 3)),
        "fps_id": jnp.full((1,), 6.0),
        "motion_bucket_id": jnp.full((1,), 127.0),
        "cond_aug": jnp.full((1,), 0.02),
        "polars_rad": jnp.linspace(0, 1, t),
        "azimuths_rad": jnp.linspace(0, 2, t),
        "rad": jnp.zeros((t,)),
    }
    out = cond(batch)
    # per-frame keys promote the vector to per-frame rows
    assert out["vector"].shape == (t, 16 * 6)
    # per-video embeds are broadcast, per-frame ones vary
    v = np.asarray(out["vector"])
    np.testing.assert_array_equal(v[:, :16], np.tile(v[0, :16], (t, 1)))
    assert not np.allclose(v[0, 3 * 16:4 * 16], v[1, 3 * 16:4 * 16])


def test_est_dataset_variant_knobs(tmp_path):
    """The loader-family parity knobs (PARITY.md appendix): hint modes,
    alternate depth dir, pinned sample + repeat, hint-frames dir,
    pose_fn v2, reversal off."""
    root = str(tmp_path / "000000000")
    _write_scene(root, with_poses=True)
    # alternate control dir + pre-inpainted hint frames dir
    os.makedirs(os.path.join(root, "disparity"))
    os.makedirs(os.path.join(root, "inpainted"))
    rng = np.random.default_rng(7)
    for i in range(T):
        v = f"{i:05d}"
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)
                        ).save(f"{root}/disparity/{v}.png")
        Image.fromarray(np.full((H, W, 3), 200, np.uint8)
                        ).save(f"{root}/inpainted/{v}.png")

    widths = {"full": 7, "nodepth": 4, "frames_only": 3, "extended": 8,
              "extended_unmasked": 8, "no_frames": 4, "nomask": 6}
    for mode, c in widths.items():
        ds = EstSVDForwardDataset(str(tmp_path), size=(H, W),
                                  num_frames=T, hint_mode=mode)
        assert ds[0]["control_hint"].shape == (T, H, W, c), mode

    # no_frames hint carries no rgb content; unmasked hint does inside
    # the mask where the masked variant is zeroed.
    ds_ext = EstSVDForwardDataset(str(tmp_path), size=(H, W),
                                  num_frames=T, hint_mode="extended",
                                  reversal=False)
    ds_unm = EstSVDForwardDataset(str(tmp_path), size=(H, W),
                                  num_frames=T,
                                  hint_mode="extended_unmasked",
                                  reversal=False)
    be, bu = ds_ext[0], ds_unm[0]
    m = be["masks"][0, :, :, 0] > 0.5
    assert np.abs(be["control_hint"][0][m][:, 4:7]).max() == 0.0
    assert np.abs(bu["control_hint"][0][m][:, 4:7]).max() > 0.0

    # hint_frames_dir: hint frame channels come from inpainted/, the
    # target jpg stays rgb/.
    ds_inp = EstSVDForwardDataset(str(tmp_path), size=(H, W),
                                  num_frames=T,
                                  hint_mode="extended_unmasked",
                                  hint_frames_dir="inpainted",
                                  reversal=False)
    b = ds_inp[0]
    np.testing.assert_allclose(b["control_hint"][0][:, :, 4:7],
                               np.full((H, W, 3), 200 / 255 * 2 - 1),
                               atol=2e-2)
    assert not np.allclose(b["jpg"][0], b["control_hint"][0][:, :, 4:7])

    # depth_dir switch
    dd = EstSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                              depth_dir="disparity", reversal=False)
    de = EstSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                              reversal=False)
    assert not np.allclose(dd[0]["control_hint"][..., :3],
                           de[0]["control_hint"][..., :3])

    # pinned sample + repeat (BlendingDataset / SingleVideoDataset role)
    dp = EstSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                              sample_id=0, repeat=5, reversal=False)
    assert len(dp) == 5
    np.testing.assert_array_equal(dp[3]["jpg"], dp[0]["jpg"])

    # pose_fn v2: wrapped SV3D ranges
    dv2 = EstSVDForwardDataset(str(tmp_path), size=(H, W), num_frames=T,
                               pose_cond=True, pose_fn="v2",
                               reversal=False)
    b2 = dv2[0]
    assert (b2["azimuths_rad"] >= 0).all()
    assert (b2["polars_rad"] >= 0).all() and (b2["polars_rad"] < np.pi).all()
