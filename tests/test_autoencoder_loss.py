"""Autoencoder adversarial-loss tests: PatchGAN discriminator torch
golden, hinge/vanilla formula checks, adversarial learning, and the
vae_finetune CLI (reference
``sgm/modules/autoencoding/losses/discriminator_loss.py`` +
``lpips/model/model.py`` + ``lpips/vqperceptual.py``)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.diffusion.autoencoder_loss import (
    GANLossConfig, PatchDiscriminator, discriminator_loss,
    generator_loss, hinge_d_loss, vanilla_d_loss)


def _torch_nlayer_discriminator(ndf, n_layers):
    """Reference NLayerDiscriminator (model.py:17-88), BatchNorm."""
    import torch.nn as tnn

    seq = [tnn.Conv2d(3, ndf, 4, stride=2, padding=1),
           tnn.LeakyReLU(0.2, True)]
    nf = 1
    for i in range(1, n_layers):
        prev, nf = nf, min(2 ** i, 8)
        seq += [tnn.Conv2d(ndf * prev, ndf * nf, 4, stride=2, padding=1,
                           bias=False),
                tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True)]
    prev, nf = nf, min(2 ** n_layers, 8)
    seq += [tnn.Conv2d(ndf * prev, ndf * nf, 4, stride=1, padding=1,
                       bias=False),
            tnn.BatchNorm2d(ndf * nf), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * nf, 1, 4, stride=1, padding=1)]
    return tnn.Sequential(*seq)


def test_patch_discriminator_matches_torch_golden():
    torch = pytest.importorskip("torch")
    ndf, n_layers = 16, 3
    tmodel = _torch_nlayer_discriminator(ndf, n_layers).eval()
    rng = np.random.default_rng(0)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Conv2d):
            m.weight.data = torch.from_numpy(
                rng.normal(0, 0.05, m.weight.shape).astype(np.float32))
            if m.bias is not None:
                m.bias.data = torch.from_numpy(
                    rng.normal(0, 0.05, m.bias.shape).astype(np.float32))

    disc = PatchDiscriminator(ndf=ndf, n_layers=n_layers, norm="batch")
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    variables = disc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          train=False)

    convs = [m for m in tmodel.modules()
             if isinstance(m, torch.nn.Conv2d)]
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    names = [f"conv_{i}" for i in range(n_layers + 1)] + ["head"]
    for name, tconv in zip(names, convs):
        params[name]["kernel"] = jnp.asarray(
            tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
        if "bias" in params[name]:
            params[name]["bias"] = jnp.asarray(
                tconv.bias.detach().numpy())

    got = disc.apply({"params": params,
                      "batch_stats": variables["batch_stats"]},
                     jnp.asarray(x), train=False)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(got)[..., 0],
                               want.numpy()[:, 0], rtol=1e-4, atol=1e-5)


def test_d_loss_formulas_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    lr = rng.normal(0, 2, (4, 5, 5, 1)).astype(np.float32)
    lf = rng.normal(0, 2, (4, 5, 5, 1)).astype(np.float32)
    tr, tf = torch.from_numpy(lr), torch.from_numpy(lf)
    # vqperceptual.py:5-17
    want_h = 0.5 * (F.relu(1.0 - tr).mean() + F.relu(1.0 + tf).mean())
    want_v = 0.5 * (F.softplus(-tr).mean() + F.softplus(tf).mean())
    assert float(hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))) == \
        pytest.approx(float(want_h), rel=1e-6)
    assert float(vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))) == \
        pytest.approx(float(want_v), rel=1e-6)


def test_generator_loss_terms_and_disc_warmup_gate():
    """NLL term matches the formula; the adversarial term is gated off
    before disc_start and on after (discriminator_loss.py:246-258)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)), jnp.float32)
    logvar = jnp.float32(0.3)

    def disc_apply(img):  # deterministic fake critic
        return jnp.mean(img, axis=-1, keepdims=True) * 2.0

    cfg = GANLossConfig(disc_start=100, disc_weight=1.0, disc_factor=1.0)
    loss_pre, log_pre = generator_loss(disc_apply, x, r, logvar,
                                       global_step=5, cfg=cfg)
    rec = jnp.abs(x - r)
    nll = rec / jnp.exp(logvar) + logvar
    want_nll = float(jnp.sum(nll) / 2)
    assert float(log_pre["loss/nll"]) == pytest.approx(want_nll, rel=1e-6)
    # gated: total == weighted nll only
    assert float(loss_pre) == pytest.approx(want_nll, rel=1e-6)

    loss_post, log_post = generator_loss(disc_apply, x, r, logvar,
                                         global_step=200, cfg=cfg)
    g = float(log_post["loss/g"])
    dw = float(log_post["scalars/d_weight"])
    assert g == pytest.approx(float(-jnp.mean(disc_apply(r))), rel=1e-6)
    assert dw > 0
    assert float(loss_post) == pytest.approx(want_nll + dw * g, rel=1e-5)

    # KL regularization enters with its weight
    cfg_kl = GANLossConfig(disc_start=100, regularization_weights=(
        ("kl_loss", 0.5),))
    kl = jnp.asarray([2.0, 4.0])
    loss_kl, _ = generator_loss(disc_apply, x, r, logvar, 5, cfg_kl,
                                regularization_log={"kl_loss": kl})
    assert float(loss_kl) == pytest.approx(want_nll + 0.5 * 3.0, rel=1e-5)


def test_discriminator_learns_to_separate():
    """A few hinge steps on fixed real/fake batches must push
    logits(real) above logits(fake) — the adversarial pair actually
    trains (not just runs)."""
    import optax

    rng = np.random.default_rng(3)
    real = jnp.asarray(np.clip(
        rng.normal(0.5, 0.1, (8, 16, 16, 3)), 0, 1), jnp.float32)
    fake = jnp.asarray(np.clip(
        rng.normal(-0.5, 0.1, (8, 16, 16, 3)), -1, 0), jnp.float32)
    disc = PatchDiscriminator(ndf=16, n_layers=2)
    params = disc.init(jax.random.PRNGKey(0), real)["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    cfg = GANLossConfig(disc_start=0)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return discriminator_loss(
                lambda img: disc.apply({"params": p}, img),
                real, fake, 0, cfg)

        (_, log), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, log

    first = None
    for _ in range(60):
        params, opt, log = step(params, opt)
        if first is None:
            first = float(log["loss/disc"])
    assert float(log["logits/real"]) > float(log["logits/fake"]) + 0.5
    assert float(log["loss/disc"]) < first


def test_vae_finetune_cli(tmp_path):
    """End-to-end tiny finetune: runs, logs, reconstruction improves,
    checkpoints both nets."""
    from multiview_inpaint_tpu.gs import scene_io
    from multiview_inpaint_tpu.pipelines import vae_finetune

    rng = np.random.default_rng(4)
    data_dir = os.path.join(str(tmp_path), "imgs")
    os.makedirs(data_dir)
    for i in range(4):
        yy, xx = np.mgrid[0:32, 0:32] / 32.0
        img = np.stack([yy, xx, np.full_like(yy, 0.25 * i)], -1)
        scene_io.save_image(os.path.join(data_dir, f"{i}.png"),
                            img.astype(np.float32))
    out_dir = os.path.join(str(tmp_path), "out")
    vae_finetune.main([
        "--data_dir", data_dir, "--out_dir", out_dir, "--tiny",
        "--steps", "30", "--resolution", "32", "--batch_size", "4",
        "--lr", "2e-3", "--disc_start", "10", "--log_interval", "5"])
    log = [json.loads(l) for l in
           open(os.path.join(out_dir, "train_log.jsonl"))]
    recs = [r["loss/rec"] for r in log]
    assert recs[-1] < recs[0]
    assert all(np.isfinite(r["loss/total"]) for r in log)
    # disc warm-up gate: zero disc loss before step 10
    assert log[0]["loss/disc"] == 0.0 and log[-1]["loss/disc"] != 0.0
    from multiview_inpaint_tpu.diffusion import checkpoint as ckpt
    vp = ckpt.load_params(os.path.join(out_dir, "vae_params.npz"))
    dp = ckpt.load_params(os.path.join(out_dir, "disc_params.npz"))
    assert "params" in vp and "params" in dp
