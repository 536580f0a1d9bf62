"""Warp-map geometry tests."""

import numpy as np

from multiview_inpaint_tpu.data.warp import compute_warp_maps


def test_static_camera_identity_warp():
    t, H, W = 3, 32, 32
    depths = np.full((t, H, W), 2.0, np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    hit, ind = compute_warp_maps(depths, poses, K, latent_hw=(8, 8))
    assert hit.shape == (t - 1, 8, 8)
    assert ind.shape == (t - 1, 4, 64)
    # static camera: every pixel maps to itself and hits
    np.testing.assert_array_equal(hit, 1.0)
    expect = np.arange(64)
    for f in range(t - 1):
        np.testing.assert_array_equal(ind[f, 0], expect)


def test_translated_camera_shifts_indices():
    t, H, W = 2, 32, 32
    depths = np.full((t, H, W), 4.0, np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    # frame 1 camera moved +x; its points project LEFT-shifted in frame 0?
    poses[1, 0, 3] = 1.0
    K = np.array([[32.0, 0, W / 2], [0, 32.0, H / 2], [0, 0, 1]])
    hit, ind = compute_warp_maps(depths, poses, K, latent_hw=(16, 16))
    # world points of frame 1 pixels are shifted +1 in x; in frame 0's
    # camera they appear at u = fx*(x+1)/z + cx -> shifted right by
    # fx/z = (32*16/32)/4 = 4 pixels at latent res... fx_lat = 32*0.5=16,
    # shift = 16*1/4 = 4.
    grid = np.arange(256).reshape(16, 16)
    inner = ind[0, 0].reshape(16, 16)[:, :11]
    np.testing.assert_array_equal(inner, grid[:, 4:15])
    # pixels whose reprojection falls off-screen are masked
    assert hit[0, :, 12:].mean() == 0.0
    assert hit[0, :, :11].mean() == 1.0


def test_warp_feeds_loss():
    import jax.numpy as jnp
    from multiview_inpaint_tpu.diffusion.losses import warp_consistency_loss
    t, h, w, c = 3, 8, 8, 4
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(t, h, w, c)), jnp.float32)
    hit = np.ones((t - 1, h, w), np.float32)
    ind = np.tile(np.arange(h * w, dtype=np.int32), (t - 1, c, 1))
    wbc = jnp.ones((t, 1, 1, 1))
    loss = warp_consistency_loss(out, jnp.asarray(hit), jnp.asarray(ind),
                                 wbc)
    # identity warp: loss = mean (prev - next)^2 per frame pair
    expect = np.mean((np.asarray(out)[:-1] - np.asarray(out)[1:]) ** 2,
                     axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(loss)[1:], expect, rtol=1e-5)
    assert float(loss[0]) == 0.0
