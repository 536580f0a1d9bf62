"""Train the ControlNet of the multi-view SVD inpainter.

Reference counterpart: ``python main.py --base configs/training/
svd_f_est_ctrl_simp1.yaml`` (PL DDP, 50 epochs, lr 1e-4, ckpt every 5
epochs, ControlNet-only parameters, LitEma, grad accumulation, LR
schedules). TPU-native: one jitted SPMD step over a *video batch*
sharded on the ``data`` mesh axis (params replicated, gradient mean via
ICI psum); EMA/schedules/accumulation through optax; checkpoints pruned
to ControlNet params (npz); crash checkpointing on exception (the
reference's "melk" handler) plus SIGUSR1 on demand.

    python -m multiview_inpaint_tpu.pipelines.svd_train \
        --data_root <dst14_est_forward60_2k> --logdir logs/simp1 \
        [--epochs 50] [--lr 1e-4] [--batch_size N] [--ema] \
        [--accumulate 1] [--schedule constant|linear|warmup_cosine] \
        [--warp_loss] [--mask_shrink_k 0.4] [--pose_cond]

``--warp_loss`` switches to ``WarpSVDForwardDataset`` (scenes with
depth + poses.npy + metadata K) and adds the InpaintDiffusionLoss2
warp-consistency term (reference loss.py:233-376). ``--mask_shrink_k``
enables the random mask-shrink augmentation; ``--pose_cond`` appends
SV3D-style azimuth/polar/radius fourier embeddings to the vector cond
(requires poses.npy per scene and a matching adm_in_channels).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal
import time

import jax
import jax.numpy as jnp

from ..data.svd_dataset import (EstSVDForwardDataset,
                                WarpSVDForwardDataset, epoch_iterator)
from ..diffusion import checkpoint as ckpt
from ..diffusion.engine import EngineConfig, SVDEngine, init_engine
from ..parallel import make_mesh
from ..parallel.svd_data_parallel import (apply_trainable,
                                          build_optimizer,
                                          make_dp_train_step,
                                          replicate_state, shard_svd_batch,
                                          trainable_params)
from ..utils.logging import RunLogger


POSE_KEYS = ("polars_rad", "azimuths_rad", "rad")


def _engine_config(args) -> EngineConfig:
    vector_keys = ("fps_id", "motion_bucket_id", "cond_aug")
    if getattr(args, "pose_cond", False):
        vector_keys = vector_keys + POSE_KEYS
    adm = 256 * len(vector_keys)
    hint_channels = 3 if getattr(args, "warp_loss", False) else 7
    if args.tiny_model:
        import dataclasses as _dc

        from ..diffusion.clip_vit import TINY_VIT
        from ..diffusion.unet import UNetConfig
        from ..diffusion.vae import VAEConfig
        return EngineConfig(
            unet=UNetConfig(model_channels=32, num_res_blocks=1,
                            attention_resolutions=(1,),
                            channel_mult=(1, 2), num_head_channels=16,
                            context_dim=16, adm_in_channels=adm,
                            out_zero_init=False),
            vae=VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
            vit=_dc.replace(TINY_VIT, output_dim=16),
            num_frames=args.num_frames, vector_keys=vector_keys,
            hint_channels=hint_channels)
    from ..diffusion.unet import UNetConfig
    return EngineConfig(num_frames=args.num_frames,
                        compute_dtype=args.compute_dtype,
                        remat=({"none": False, "all": "all",
                                "attn": "attn"}[args.remat]),
                        unet=UNetConfig(adm_in_channels=adm),
                        vector_keys=vector_keys,
                        hint_channels=hint_channels)


def train(args):
    cfg = _engine_config(args)
    eng = SVDEngine(cfg)
    key = jax.random.key(args.seed)
    key, init_key = jax.random.split(key)
    state = init_engine(cfg, init_key,
                        latent_hw=(args.size[0] // 8, args.size[1] // 8),
                        param_dtype=(None if args.tiny_model
                                     else args.param_dtype))
    if args.base_ckpt:
        if args.base_ckpt.endswith((".safetensors", ".ckpt", ".pth")):
            from ..diffusion import weights_io
            sd = weights_io.load_torch_state_dict(args.base_ckpt)
            merged, report = weights_io.import_svd(
                {"unet": state.unet, "vae": state.vae,
                 "clip": state.clip}, sd, clip_heads=cfg.vit.heads)
            state = dataclasses.replace(state, **merged)
            print(f"torch base ckpt (missing, unexpected): {report}")
        else:
            loaded = ckpt.load_params(args.base_ckpt)
            merged, missing, unexpected = ckpt.merge_params(
                {"unet": state.unet, "vae": state.vae,
                 "clip": state.clip}, loaded)
            state = dataclasses.replace(state, **merged)
            print(f"base ckpt: {len(missing)} missing, "
                  f"{len(unexpected)} unexpected")
        from ..diffusion.engine import init_controlnet_from_unet
        state = init_controlnet_from_unet(state)
    if args.resume:
        state = dataclasses.replace(
            state, controlnet=ckpt.load_params(args.resume))

    if args.warp_loss:
        ds = WarpSVDForwardDataset(
            args.data_root, size=args.size, num_frames=args.num_frames,
            cond_aug=args.cond_aug, train=True,
            mask_shrink_k=args.mask_shrink_k or 0.4)
    else:
        ds = EstSVDForwardDataset(
            args.data_root, size=args.size, num_frames=args.num_frames,
            cond_aug=args.cond_aug, mask_shrink_k=args.mask_shrink_k,
            pose_cond=args.pose_cond)
    steps_per_epoch = max(1, len(ds) // args.batch_size)
    optimizer = build_optimizer(args.lr, args.schedule, args.warmup_steps,
                                steps_per_epoch * args.epochs,
                                args.accumulate)
    trainable = trainable_params(state, args.train_label_emb)
    opt_state = optimizer.init(trainable)
    step_fn = make_dp_train_step(
        eng, optimizer, ema_decay=(args.ema_decay if args.ema else None),
        train_label_emb=args.train_label_emb, use_warp=args.warp_loss)
    # The dp step donates state AND ema; the EMA tree must own distinct
    # buffers (trainable is the state's own leaves — aliasing them would
    # donate the same buffer twice).
    ema = jax.tree_util.tree_map(jnp.copy, trainable)

    mesh = make_mesh(min(args.devices or len(jax.devices()),
                         len(jax.devices())))
    state = replicate_state(state, mesh)
    opt_state = replicate_state(opt_state, mesh)
    ema = replicate_state(ema, mesh)

    os.makedirs(args.logdir, exist_ok=True)
    logger = RunLogger(args.logdir, "svd_train",
                       backend="wandb" if args.wandb else "jsonl",
                       wandb_project=args.wandb_project,
                       config=vars(args))

    def save(tag):
        path = os.path.join(args.logdir, "checkpoints", f"{tag}.npz")
        # pruned checkpoint: controlnet (+label_emb when trained), like
        # the reference's on_save_checkpoint
        tree = ema if args.ema else trainable_params(
            state, args.train_label_emb)
        ckpt.save_params(path, tree["controlnet"] if list(tree) == [
            "controlnet"] else tree)
        logger.echo(f"saved {path}")
        if args.keep_last and tag.startswith("epoch="):
            kept = sorted(f for f in os.listdir(os.path.dirname(path))
                          if f.startswith("epoch=") and
                          f.endswith(".npz"))
            for old in kept[:-args.keep_last]:
                os.remove(os.path.join(os.path.dirname(path), old))
                logger.echo(f"rotated out {old}")

    signal.signal(signal.SIGUSR1, lambda *_: save("melk"))

    def make_batch(items):
        lat, conds = [], []
        for _, b in items:
            bj = {k: jnp.asarray(v) for k, v in b.items()
                  if k != "num_video_frames"}
            key_l = jax.random.fold_in(jax.random.key(args.seed),
                                       len(lat))
            latents = eng.encode_first_stage(state, bj["jpg"],
                                             sample_key=key_l)
            cond = eng.prepare_cond(state, bj, key=key_l)
            if args.warp_loss:
                cond["hit_map"] = bj["hit_map"]
                cond["uv_ind"] = bj["uv_ind"]
            lat.append(latents)
            conds.append(cond)
        latents_b = jnp.stack(lat)
        cond_b = {k: jnp.stack([c[k] for c in conds])
                  for k in conds[0]}
        return latents_b, cond_b

    gstep = 0
    try:
        for epoch in range(args.epochs):
            t0 = time.time()
            items = []
            for it in epoch_iterator(ds, seed=args.seed + epoch):
                items.append(it)
                if len(items) < args.batch_size:
                    continue
                latents_b, cond_b = make_batch(items)
                items = []
                with mesh:
                    latents_b, cond_b = shard_svd_batch(latents_b, cond_b,
                                                        mesh)
                    key, k = jax.random.split(key)
                    state, opt_state, ema, loss = step_fn(
                        state, opt_state, ema, k, latents_b, cond_b)
                gstep += 1
                if args.log_images_every and \
                        gstep % args.log_images_every == 0:
                    _log_images(eng, state, latents_b, cond_b, key,
                                args, gstep)
                if gstep % args.log_interval == 0:
                    logger.log(gstep, epoch=epoch, loss=loss,
                               sec_per_step=(time.time() - t0)
                               / args.log_interval)
                    t0 = time.time()
            if (epoch + 1) % args.ckpt_every == 0 or \
                    epoch == args.epochs - 1:
                save(f"epoch={epoch:06d}")
    except Exception:
        save("last")  # crash checkpoint (reference SetupCallback)
        raise
    if args.final_ema_eval and args.ema:
        _final_ema_eval(eng, state, ema, ds, make_batch, mesh, args,
                        logger)
    logger.close()


def _final_ema_eval(eng, state, ema, ds, make_batch, mesh, args, logger):
    """End-of-run EMA-vs-raw objective on a fixed batch set (the
    reference evaluates the LitEma swap at validation,
    main.py:309-487): same keys, same data, loss under raw trainable
    weights vs the EMA tree."""
    import json as _json

    from ..parallel.svd_data_parallel import trainable_params as _tp

    @jax.jit
    def eval_loss(st0, trainable, key, lat_b, cond_b):
        def per_video(k, lat, cond):
            st = apply_trainable(st0, trainable)
            return eng.loss(st, k, lat, cond)
        keys = jax.random.split(key, lat_b.shape[0])
        return jnp.mean(jax.vmap(per_video)(keys, lat_b, cond_b))

    batches = []
    items = []
    for it in epoch_iterator(ds, seed=args.seed + 10_000):
        items.append(it)
        if len(items) == args.batch_size:
            batches.append(make_batch(items))
            items = []
        if len(batches) >= args.final_ema_eval:
            break
    raw = _tp(state, args.train_label_emb)
    tot = {"raw": 0.0, "ema": 0.0}
    for i, (lb, cb) in enumerate(batches):
        with mesh:
            lb, cb = shard_svd_batch(lb, cb, mesh)
            k = jax.random.fold_in(jax.random.key(args.seed + 20_000), i)
            tot["raw"] += float(eval_loss(state, raw, k, lb, cb))
            tot["ema"] += float(eval_loss(state, ema, k, lb, cb))
    n = max(1, len(batches))
    row = {"final_eval_batches": n,
           "loss_raw": tot["raw"] / n,
           "loss_ema": tot["ema"] / n}
    logger.log(-1, event="final_ema_eval", **row)
    logger.echo("final_ema_eval " + _json.dumps(row))


def _log_images(eng, state, latents_b, cond_b, key, args, gstep):
    """Periodic sample grids during training (the reference ImageLogger,
    main.py:309-487): sample the current model on the first batch item
    and write a 4-wide grid under <logdir>/log_img/train."""
    import numpy as np

    from ..gs import scene_io
    from .svd_test import to_grid
    cond = {k: v[0] for k, v in cond_b.items()}
    t = args.num_frames
    h8, w8 = args.size[0] // 8, args.size[1] // 8
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])
    uc["concat"] = jnp.zeros_like(cond["concat"])
    z = eng.sample(state, key, cond, uc, latent_shape=(t, h8, w8, 4))
    frames = np.asarray(eng.decode_first_stage(state, z, timesteps=t))
    out = os.path.join(args.logdir, "log_img", "train",
                       f"samples_gs-{gstep:06d}.png")
    scene_io.save_image(out, to_grid(frames))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--logdir", default="logs/run")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=1,
                   help="videos per step (sharded over devices)")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--cond_aug", type=float, default=0.0)
    p.add_argument("--base_ckpt", default=None,
                   help="pretrained SVD weights (torch safetensors/ckpt "
                        "or our npz)")
    p.add_argument("--resume", default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--train_label_emb", action="store_true",
                   help="also train the UNet label embedding "
                        "(VideoDiffusionEngine variant)")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--schedule", default="constant",
                   choices=["constant", "linear", "warmup_cosine"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--accumulate", type=int, default=1)
    p.add_argument("--ckpt_every", type=int, default=5)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--remat", choices=("none", "attn", "all"),
                   default="none",
                   help="per-block activation rematerialization (the "
                        "full-size config trains with 'all'; reference "
                        "use_checkpoint)")
    p.add_argument("--keep_last", type=int, default=0,
                   help="rotate epoch checkpoints, keeping the newest N "
                        "(0 = keep all)")
    p.add_argument("--final_ema_eval", type=int, default=0,
                   help="with --ema: end-of-run loss on N fixed batches "
                        "under raw vs EMA weights")
    p.add_argument("--log_images_every", type=int, default=0,
                   help="sample + save a train grid every N steps "
                        "(ImageLogger parity; 0 = off)")
    p.add_argument("--wandb", action="store_true",
                   help="mirror metrics to wandb when the package is "
                        "available (reference main.py:676-700 "
                        "WandbLogger); degrades to JSONL otherwise")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--param_dtype", default="bfloat16",
                   help="weight storage dtype for the full-size "
                        "model (2.9B params need bf16 on 16GB chips)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny_model", action="store_true",
                   help="debug-size model for smoke tests")
    p.add_argument("--warp_loss", action="store_true",
                   help="warp-consistency training over depth+pose "
                        "scenes (InpaintDiffusionLoss2 parity)")
    p.add_argument("--mask_shrink_k", type=float, default=0.0,
                   help="random mask-shrink augmentation strength "
                        "(reference process_mask k_max; 0 = off)")
    p.add_argument("--pose_cond", action="store_true",
                   help="append azimuth/polar/radius fourier embeddings "
                        "to the vector cond (needs poses.npy per scene)")
    train(p.parse_args(argv))


if __name__ == "__main__":
    main()
