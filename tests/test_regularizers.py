"""Latent regularizers: KL formula, VQ straight-through + torch-golden
nearest-code, EMA codebook convergence (reference
``sgm/modules/autoencoding/regularizers/``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.diffusion.regularizers import (
    VectorQuantizer, diagonal_gaussian_regularizer, ema_codebook_update,
    ema_quantize, init_ema_codebook)


def test_diagonal_gaussian_regularizer_kl():
    rng = np.random.default_rng(0)
    mean = rng.normal(0, 1, (2, 4, 4, 4)).astype(np.float32)
    logvar = rng.normal(0, 0.3, (2, 4, 4, 4)).astype(np.float32)
    zp = jnp.concatenate([jnp.asarray(mean), jnp.asarray(logvar)], -1)
    z, log = diagonal_gaussian_regularizer(zp, sample=False)
    np.testing.assert_allclose(np.asarray(z), mean, atol=1e-6)
    want = 0.5 * (mean ** 2 + np.exp(logvar) - 1 - logvar).reshape(
        2, -1).sum(1)
    assert float(log["kl_loss"]) == pytest.approx(float(want.mean()
                                                        * 1.0), rel=1e-5)
    z2, _ = diagonal_gaussian_regularizer(zp, key=jax.random.key(1))
    assert not np.allclose(np.asarray(z2), mean)  # sampled


def test_vq_matches_torch_nearest_and_straight_through():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    vq = VectorQuantizer(n_codes=32, dim=4, beta=0.25)
    z = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)), jnp.float32)
    params = vq.init(jax.random.key(0), z)["params"]
    zq, log = vq.apply({"params": params}, z)
    assert zq.shape == z.shape

    # torch oracle: full argmin over squared distances
    cb = torch.from_numpy(np.asarray(params["codebook"]))
    flat = torch.from_numpy(np.asarray(z).reshape(-1, 4))
    d = (flat.pow(2).sum(1, keepdim=True)
         - 2 * flat @ cb.T + cb.pow(2).sum(1))
    want_idx = torch.argmin(d, dim=1).numpy()
    np.testing.assert_array_equal(np.asarray(log["indices"]), want_idx)

    # straight-through: dL/dz of sum(z_q) == ones
    g = jax.grad(lambda zz: jnp.sum(
        vq.apply({"params": params}, zz)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    assert float(log["perplexity"]) > 1.0


def test_vq_training_reduces_quantization_error():
    import optax

    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.normal(0, 1, (64, 4)), jnp.float32)
    vq = VectorQuantizer(n_codes=8, dim=4)
    params = vq.init(jax.random.key(0), data)["params"]
    tx = optax.adam(5e-2)
    opt = tx.init(params)

    def loss_fn(p):
        _, log = vq.apply({"params": p}, data)
        return log["vq_loss"]

    first = float(loss_fn(params))
    for _ in range(120):
        g = jax.grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, upd)
    # 8 codes on 64 random 4-d gaussians: converges to ~0.36x (the
    # residual within-cluster variance is irreducible)
    assert float(loss_fn(params)) < 0.45 * first


def test_ema_codebook_converges_to_cluster_means():
    rng = np.random.default_rng(3)
    centers = np.array([[2.0, 0, 0, 0], [-2.0, 0, 0, 0]], np.float32)
    data = jnp.asarray(
        centers[rng.integers(0, 2, 256)]
        + rng.normal(0, 0.05, (256, 4)).astype(np.float32))
    state = init_ema_codebook(jax.random.key(0), n_codes=2, dim=4)
    for _ in range(80):
        state = ema_codebook_update(state, data, decay=0.8)
    got = np.sort(np.asarray(state["codebook"])[:, 0])
    np.testing.assert_allclose(got, [-2.0, 2.0], atol=0.15)
    zq, log = ema_quantize(state, data)
    err = float(jnp.mean((zq - data) ** 2))
    assert err < 0.01 and float(log["perplexity"]) > 1.8
