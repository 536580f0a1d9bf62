"""Metrics tests: PSNR/SSIM/sharpness natives, LPIPS machinery, CLIP fns."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.metrics import metrics as M


def test_psnr_masked():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.zeros((8, 8, 3), np.float32)
    b[:4] = 0.5  # error only in top half
    mask_bottom = np.zeros((8, 8), np.float32)
    mask_bottom[4:] = 1.0
    assert M.psnr(a, b, mask_bottom) > 80  # masked region identical
    assert M.psnr(a, b) < 12


def test_sharpness_orders_blur():
    rng = np.random.default_rng(0)
    sharp = rng.random((32, 32, 3)).astype(np.float32)
    blurred = sharp.copy()
    for _ in range(4):
        blurred = 0.25 * (np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0)
                          + np.roll(blurred, 1, 1)
                          + np.roll(blurred, -1, 1))
    assert M.laplacian_sharpness(sharp) > M.laplacian_sharpness(blurred)


def test_clip_similarity_functions_with_fake_encoder():
    rng = np.random.default_rng(1)

    def img_embed(im):
        return np.array([im.mean(), im.std(), 1.0])

    def text_embed(t):
        return np.array([len(t) / 10.0, 1.0, 0.0])

    imgs = [rng.random((8, 8, 3)) for _ in range(3)]
    s = M.text_img_similarity(img_embed, text_embed, imgs, "hello")
    assert -1 <= s <= 1
    d = M.directional_similarity(img_embed, text_embed, imgs, imgs,
                                 "a", "b")
    assert -1 <= d <= 1
    t = M.temporal_similarity(img_embed, [imgs[0]] * 3)
    assert t == pytest.approx(1.0)


def test_lpips_zero_for_identical_and_positive_for_different():
    from multiview_inpaint_tpu.metrics.lpips import LPIPS
    net = LPIPS()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)
    b = jnp.asarray(rng.random((1, 32, 32, 3)) * 2 - 1, jnp.float32)
    params = net.init(jax.random.key(0), a, a)["params"]
    d_same = net.apply({"params": params}, a, a)
    d_diff = net.apply({"params": params}, a, b)
    assert float(jnp.abs(d_same[0])) < 1e-6
    assert abs(float(d_diff[0])) > 0


def test_lpips_weight_import_shapes():
    from flax.traverse_util import flatten_dict
    from multiview_inpaint_tpu.metrics.lpips import (LPIPS,
                                                     import_torch_weights)
    net = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.key(0), x, x)["params"]
    rng = np.random.default_rng(3)
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_state = {}
    cin = 3
    for ti, co in zip(torch_idx, chans):
        vgg_state[f"features.{ti}.weight"] = rng.normal(
            size=(co, cin, 3, 3)).astype(np.float32)
        vgg_state[f"features.{ti}.bias"] = rng.normal(size=(co,)).astype(
            np.float32)
        cin = co
    lp_state = {f"lin{i}.model.1.weight": rng.normal(
        size=(1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate([64, 128, 256, 512, 512])}
    merged = import_torch_weights(params, vgg_state, lp_state)
    for k, v in flatten_dict(merged).items():
        assert v.shape == flatten_dict(params)[k].shape, k
    # imported weights actually land (not equal to init)
    got = flatten_dict(merged)[("vgg", "conv_0", "kernel")]
    np.testing.assert_allclose(
        np.asarray(got),
        vgg_state["features.0.weight"].transpose(2, 3, 1, 0))
