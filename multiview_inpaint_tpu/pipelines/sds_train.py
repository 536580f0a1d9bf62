"""SDS coarse object geometry — reference ``gs-simp/sds_train.py``.

Seeds 30k gaussians in the insertion OBB on top of the del background and
optimizes 5k iterations with background-masked photometric loss + SDS
from a Stable-Diffusion-inpainting prior (CFG 100, sds_weight 1e-6), on
cone-filtered training cameras. Saves to
``output_sds/<scene>_<case>/point_cloud/iteration_N``.

The diffusion prior comes from ``--sd_ckpt`` (SD-2-inpainting weights as
torch .safetensors/.ckpt, imported via weights_io) plus ``--text_embs``
(npy [2, L, 1024]: uncond + prompt embedding, precomputed with any CLIP
text encoder). Without a prior (``--no_sds``) the stage degrades to
background-preserving densification — useful for dry runs.

    python -m multiview_inpaint_tpu.pipelines.sds_train \
        --scene_id <scene>_<case> -s dataset/<scene> -m output_sds/<...> \
        --bg_model output/<scene> --sd_ckpt sd2_inpaint.safetensors \
        --text_embs embs.npy
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from ..gs import gaussians as g_mod
from ..gs import obb as obb_mod
from ..gs import scene as scene_mod
from ..gs.scene import Scene, Workspace
from ..models import gs_trainer, sds_trainer
from ..models.gs_trainer import INPAINT_OPT
from ..ops.rasterizer import RenderCamera
from ..utils.logging import RunLogger
from . import common


def build_guidance(args):
    """SDSGuidance wired to a flax UNet2D + VAE with imported SD weights."""
    from ..diffusion import weights_io
    from ..diffusion.unet2d import UNet2D, UNet2DConfig
    from ..diffusion.vae import AutoencoderKL, VAEConfig
    from ..guidance.sds import SDSConfig, SDSGuidance

    unet = UNet2D(UNet2DConfig())
    vae = AutoencoderKL(VAEConfig(), video_decoder=False)
    key = jax.random.key(0)
    up = unet.init(key, jnp.zeros((1, 64, 64, 9)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 1024)))["params"]
    vp = vae.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    sd = weights_io.load_torch_state_dict(args.sd_ckpt)
    up, m1, u1 = weights_io.import_unet(up, sd, video=False)
    vp, m2, u2 = weights_io.import_vae(vp, sd, video_decoder=False)
    print(f"sd import: unet missing {len(m1)}, vae missing {len(m2)}")

    scale = 0.18215

    def eps_model(x9, t, text_emb):
        return unet.apply({"params": up}, x9, t, text_emb)

    def vae_encode(img01):
        post = vae.apply({"params": vp}, img01 * 2 - 1,
                         method=AutoencoderKL.encode)
        return post.mode() * scale

    def vae_decode(z):
        out = vae.apply({"params": vp}, z / scale, 1,
                        method=AutoencoderKL.decode)
        return (out + 1) / 2

    return SDSGuidance(eps_model, vae_encode, vae_decode,
                       SDSConfig(guidance_scale=args.guidance_scale))


def train(args):
    ws = Workspace(args.workspace, args.inpaint_root)
    scene = Scene(args.source_path, args.bg_model,
                  resolution=args.resolution, max_sh_degree=args.sh_degree,
                  shuffle=False, load_iteration=None, workspace=ws,
                  load_gaussians=False)
    scene.scene_name = args.scene_id
    box = obb_mod.load_obb(ws.bds_add(args.scene_id))
    del_ply = os.path.join(args.bg_model, "point_cloud", "del",
                           "point_cloud.ply")
    params = scene_mod.load_sd_ply(del_ply, box, n_samples=args.n_samples,
                                   max_sh_degree=args.sh_degree)
    cams = scene_mod.sds_cameras(scene, box, iteration=args.bg_iteration)
    if not cams:
        raise SystemExit("no SDS cameras (run gen_seq first)")

    guidance = None if args.no_sds else build_guidance(args)
    if guidance is not None:
        text_embs = jnp.asarray(np.load(args.text_embs))
    os.makedirs(args.model_path, exist_ok=True)
    logger = RunLogger(args.model_path)
    cfg = common.optimization_config_from(args)
    state = gs_trainer.init_state(params)
    bg = common.default_background(args.white_background)
    if args.backend == "auto":
        args.backend = ("pallas" if jax.default_backend() not in
                        ("cpu",) else "xla")
        logger.echo(f"rasterizer backend: {args.backend}")
    pair_mult = args.pair_budget_mult
    key = jax.random.key(0)
    rng = random.Random(0)
    stack = []
    for iteration in range(1, cfg.iterations + 1):
        if not stack:
            stack = list(cams)
            rng.shuffle(stack)
        cam = stack.pop()
        rcam = RenderCamera.from_camera(cam)
        gt = jnp.asarray(cam.image)
        m = jnp.asarray(cam.mask)
        key, k1, k2 = jax.random.split(key, 3)
        if guidance is None:
            state, metrics = gs_trainer.train_step(
                state, rcam, gt, bg, cfg,
                spatial_lr_scale=scene.cameras_extent,
                sh_degree=args.sh_degree, mask=m, loss_mode="background",
                max_per_tile=args.max_per_tile,
                pair_budget_mult=pair_mult, backend=args.backend)
            loss_val, extra = float(metrics.loss), {}
        else:
            state, metrics = sds_trainer.sds_train_step(
                state, rcam, gt, m, bg, cfg, guidance, text_embs, k1,
                spatial_lr_scale=scene.cameras_extent,
                sh_degree=args.sh_degree, sds_weight=args.sds_weight,
                max_per_tile=args.max_per_tile,
                pair_budget_mult=pair_mult, backend=args.backend)
            loss_val = float(metrics.loss)
            extra = {"bg": float(metrics.bg_loss),
                     "sds": float(metrics.sds_loss)}
        state, info = gs_trainer.maybe_densify(state, k2, cfg,
                                               scene.cameras_extent,
                                               iteration)
        state = gs_trainer.grow_if_needed(state, info)
        if iteration % args.log_interval == 0:
            pairs = int(metrics.pairs)
            if pairs > 0.85 * pair_mult * state.params.capacity:
                pair_mult *= 2
                logger.echo(f"[ITER {iteration}] pair budget -> "
                            f"{pair_mult}x capacity")
            logger.log(iteration, loss=loss_val,
                       points=int(state.params.num_live()), pairs=pairs,
                       **extra, **(info or {}))
        if iteration in args.save_iterations:
            path = os.path.join(args.model_path, "point_cloud",
                                f"iteration_{iteration}",
                                "point_cloud.ply")
            g_mod.save_ply(state.params, path)
            logger.echo(f"[ITER {iteration}] saved {path}")
    logger.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(parser)
    common.add_optimization_args(parser, INPAINT_OPT)
    common.add_registry_arg(parser)
    parser.add_argument("--scene_id", required=True)
    parser.add_argument("--bg_model", required=True)
    parser.add_argument("--bg_iteration", type=int, default=30000)
    parser.add_argument("--workspace", default=".")
    parser.add_argument("--inpaint_root", default="inpaint",
                        help="inpaint hand-off dir (abs or relative to workspace)")
    parser.add_argument("--n_samples", type=int, default=30000)
    parser.add_argument("--sd_ckpt", default=None)
    parser.add_argument("--text_embs", default=None)
    parser.add_argument("--no_sds", action="store_true")
    parser.add_argument("--sds_weight", type=float, default=1e-6)
    parser.add_argument("--guidance_scale", type=float, default=100.0)
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[5000])
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--pair_budget_mult", type=int, default=4)
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas"])
    parser.add_argument("--log_interval", type=int, default=50)
    args = parser.parse_args(argv)
    common.apply_registry(args)
    if not args.no_sds and (not args.sd_ckpt or not args.text_embs):
        raise SystemExit("--sd_ckpt and --text_embs required "
                         "(or pass --no_sds)")
    if args.iterations not in args.save_iterations:
        args.save_iterations = list(args.save_iterations) + [args.iterations]
    train(args)


if __name__ == "__main__":
    main()
