"""Finetune the first-stage KL autoencoder with the adversarial loss.

Reference counterpart: the sgm autoencoder training objective —
GeneralLPIPSWithDiscriminator with its two optimizers
(``sgm/modules/autoencoding/losses/discriminator_loss.py``: the
optimizer_idx 0/1 branches; the reference repo ships the loss but no
pipeline stage invokes it — this CLI makes the capability first-class).
TPU-native: one jitted alternating step — generator (autoencoder
params: L1 + optional LPIPS NLL with learnable logvar + KL + adversarial
term with the adaptive balance) then discriminator (PatchGAN hinge loss)
— both as pure optax updates, no Lightning double-optimizer machinery.

    python -m multiview_inpaint_tpu.pipelines.vae_finetune \
        --data_dir <folder of images> --out_dir <ckpt dir> \
        [--steps 100] [--resolution 64] [--batch_size 4] \
        [--lr 4.5e-6] [--disc_start 0] [--kl_weight 1e-6] \
        [--disc_weight 0.5] [--disc_loss hinge|vanilla] \
        [--perceptual_weight 0] [--lpips_ckpt vgg.npz] [--tiny]

``--tiny`` shrinks the VAE (ch=32, one level) for smoke tests/CI.
Outputs: ``<out_dir>/vae_params.npz``, ``disc_params.npz``,
``train_log.jsonl``.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import checkpoint as ckpt
from ..diffusion.autoencoder_loss import (GANLossConfig,
                                          PatchDiscriminator,
                                          discriminator_loss,
                                          generator_loss)
from ..diffusion.vae import AutoencoderKL, VAEConfig


def _load_images(data_dir, resolution):
    from ..gs import scene_io
    paths = sorted(p for ext in ("png", "jpg", "jpeg")
                   for p in glob.glob(os.path.join(data_dir, f"*.{ext}")))
    if not paths:
        raise FileNotFoundError(f"no images under {data_dir}")
    imgs = [scene_io.load_image(p, resolution=(resolution, resolution))
            for p in paths]
    return np.stack(imgs).astype(np.float32) * 2.0 - 1.0  # [-1, 1]


def build_models(tiny: bool):
    cfg = (VAEConfig(ch=32, ch_mult=(1,), num_res_blocks=1, z_channels=4)
           if tiny else VAEConfig())
    vae = AutoencoderKL(cfg, video_decoder=False)
    disc = PatchDiscriminator(ndf=32 if tiny else 64,
                              n_layers=2 if tiny else 3)
    return vae, disc


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=4.5e-6)
    parser.add_argument("--disc_lr", type=float, default=None)
    parser.add_argument("--disc_start", type=int, default=0)
    parser.add_argument("--disc_weight", type=float, default=0.5)
    parser.add_argument("--disc_loss", default="hinge",
                        choices=["hinge", "vanilla"])
    parser.add_argument("--kl_weight", type=float, default=1e-6)
    parser.add_argument("--perceptual_weight", type=float, default=0.0)
    parser.add_argument("--lpips_ckpt", default=None,
                        help="LPIPS weights npz (external artifact); "
                             "required when --perceptual_weight > 0")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_interval", type=int, default=10)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    data = _load_images(args.data_dir, args.resolution)
    vae, disc = build_models(args.tiny)
    cfg = GANLossConfig(
        disc_start=args.disc_start, disc_weight=args.disc_weight,
        disc_loss=args.disc_loss,
        perceptual_weight=args.perceptual_weight,
        learn_logvar=True,
        regularization_weights=(("kl_loss", args.kl_weight),))

    lpips_fn = None
    if args.perceptual_weight > 0:
        from ..metrics.lpips import LPIPS, import_torch_weights  # noqa
        lp = LPIPS()
        lp_params = np.load(args.lpips_ckpt, allow_pickle=True)[
            "params"].item()
        lpips_fn = lambda a, b: lp.apply({"params": lp_params}, a, b)  # noqa

    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    x0 = jnp.asarray(data[: args.batch_size])
    vae_vars = vae.init(k1, x0)
    disc_vars = disc.init(k2, x0, train=True)
    gen_state = {"params": vae_vars["params"],
                 "logvar": jnp.zeros((), jnp.float32)}

    gen_tx = optax.adam(args.lr, b1=0.5, b2=0.9)
    disc_tx = optax.adam(args.disc_lr or args.lr, b1=0.5, b2=0.9)
    gen_opt = gen_tx.init(gen_state)
    disc_opt = disc_tx.init(disc_vars["params"])

    def reconstruct(params, x, key):
        post = vae.apply({"params": params}, x,
                         method=AutoencoderKL.encode)
        z = post.sample(key)
        recon = vae.apply({"params": params}, z,
                          method=AutoencoderKL.decode)
        kl = 0.5 * jnp.sum(post.mean ** 2 + jnp.exp(post.logvar)
                           - 1.0 - post.logvar,
                           axis=tuple(range(1, post.mean.ndim)))
        return recon, kl

    @jax.jit
    def train_step(gen_state, gen_opt, disc_params, disc_opt, x, step,
                   key):
        def disc_apply(img):
            return disc.apply({"params": disc_params}, img, train=True)

        def gen_loss_fn(gs):
            recon, kl = reconstruct(gs["params"], x, key)
            loss, log = generator_loss(
                disc_apply, x, recon, gs["logvar"], step, cfg,
                lpips_fn=lpips_fn, regularization_log={"kl_loss": kl})
            return loss, (log, recon)

        (_, (g_log, recon)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gen_state)
        if not cfg.learn_logvar:
            g_grads["logvar"] = jnp.zeros_like(g_grads["logvar"])
        upd, gen_opt = gen_tx.update(g_grads, gen_opt, gen_state)
        gen_state = optax.apply_updates(gen_state, upd)

        def disc_loss_fn(dp):
            return discriminator_loss(
                lambda img: disc.apply({"params": dp}, img, train=True),
                x, recon, step, cfg)

        (_, d_log), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(disc_params)
        upd, disc_opt = disc_tx.update(d_grads, disc_opt, disc_params)
        disc_params = optax.apply_updates(disc_params, upd)
        return gen_state, gen_opt, disc_params, disc_opt, {**g_log,
                                                           **d_log}

    disc_params = disc_vars["params"]
    rng = np.random.default_rng(args.seed)
    log_path = os.path.join(args.out_dir, "train_log.jsonl")
    t0 = time.time()
    with open(log_path, "w") as f:
        for step in range(args.steps):
            idx = rng.integers(0, len(data), args.batch_size)
            key, sub = jax.random.split(key)
            gen_state, gen_opt, disc_params, disc_opt, log = train_step(
                gen_state, gen_opt, disc_params, disc_opt,
                jnp.asarray(data[idx]), jnp.int32(step), sub)
            if step % args.log_interval == 0 or step == args.steps - 1:
                rec = {k: float(v) for k, v in log.items()}
                rec.update(step=step, dt=time.time() - t0)
                f.write(json.dumps(rec) + "\n")
                print(f"step {step}: rec={rec['loss/rec']:.4f} "
                      f"g={rec['loss/g']:.4f} "
                      f"disc={rec['loss/disc']:.4f}", flush=True)

    ckpt.save_params(os.path.join(args.out_dir, "vae_params.npz"),
                     {"params": gen_state["params"],
                      "logvar": gen_state["logvar"]})
    ckpt.save_params(os.path.join(args.out_dir, "disc_params.npz"),
                     {"params": disc_params})
    print(f"saved -> {args.out_dir}")


if __name__ == "__main__":
    main()
