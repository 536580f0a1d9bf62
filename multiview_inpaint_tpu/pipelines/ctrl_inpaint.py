"""Candidate single-view 2D inpaintings — reference ``ctrl_inpaint.py``.

Generates N candidate inpaintings of the reference (frame-0) view with an
SD-inpainting UNet guided by a depth ControlNet, at 512x512 then resized
back — the user curates the best into ``inpaint/ctrl1/``.

Weights: ``--sd_ckpt`` (SD-inpainting torch checkpoint) and
``--ctrl_ckpt`` (ControlNet-depth torch checkpoint); ``--text_embs``
(npy [2, L, D], uncond + prompt — computed with
``diffusion.clip_text`` once its weights are imported, or any CLIP).
Sampler: DPM++(2M) multistep (the reference uses UniPC; both are
second-order multistep solvers — behavioral parity at 30-50 steps).

    python -m multiview_inpaint_tpu.pipelines.ctrl_inpaint \
        --scene_id <scene>_<case> --n_samples 20 \
        --sd_ckpt sd15_inpaint.ckpt --ctrl_ckpt control_depth.ckpt \
        --text_embs embs.npy
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import edm, samplers, weights_io
from ..diffusion.controlnet2d import ControlNet2D
from ..diffusion.unet2d import UNet2D, UNet2DConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig
from ..gs import scene_io
from ..gs.scene import Workspace
from ..guidance.sds import DDPMSchedule


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene_id", required=True)
    p.add_argument("--workspace", default=".")
    p.add_argument("--inpaint_root", default="inpaint")
    p.add_argument("--sd_ckpt", required=True)
    p.add_argument("--ctrl_ckpt", required=True)
    p.add_argument("--text_embs", required=True)
    p.add_argument("--n_samples", type=int, default=20)
    p.add_argument("--num_steps", type=int, default=30)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--ctrl_scale", type=float, default=1.0)
    p.add_argument("--sampler", choices=("unipc", "dpmpp2m"),
                   default="unipc",
                   help="unipc matches the reference's "
                        "UniPCMultistepScheduler (ctrl_inpaint.py:12); "
                        "dpmpp2m is the round-2 substitute")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--context_dim", type=int, default=768,
                   help="768 for SD-1.5, 1024 for SD-2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="debug-size UNet/ControlNet/VAE for smoke tests")
    args = p.parse_args(argv)

    ws = Workspace(args.workspace, args.inpaint_root)
    seq = ws.seq_dir(args.scene_id, "x1", args.iteration)
    depth_dir = ws.depth_dir(args.scene_id, "x1")
    img = scene_io.load_image(os.path.join(seq, "renders", "00.png"),
                              (args.size, args.size))
    mask = scene_io.load_image(os.path.join(seq, "mask", "00.png"),
                               (args.size, args.size), grayscale=True)
    depth = scene_io.load_image(os.path.join(depth_dir, "00.png"),
                                (args.size, args.size))
    text_embs = jnp.asarray(np.load(args.text_embs))

    if args.tiny:
        cfg2d = UNet2DConfig(model_channels=32, num_res_blocks=1,
                             attention_resolutions=(1,),
                             channel_mult=(1, 2), num_head_channels=16,
                             context_dim=args.context_dim)
        vae_cfg = VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    else:
        cfg2d = UNet2DConfig(context_dim=args.context_dim)
        vae_cfg = VAEConfig()
    unet = UNet2D(cfg2d)
    cnet = ControlNet2D(cfg2d)
    vae = AutoencoderKL(vae_cfg, video_decoder=False)
    key = jax.random.key(args.seed)
    s = args.size // 8
    up = unet.init(key, jnp.zeros((1, s, s, 9)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, args.context_dim)))["params"]
    cp = cnet.init(key, jnp.zeros((1, s, s, 9)),
                   jnp.zeros((1, args.size, args.size, 3)),
                   jnp.zeros((1,)),
                   jnp.zeros((1, 77, args.context_dim)))["params"]
    vp = vae.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    sd = weights_io.load_torch_state_dict(args.sd_ckpt)
    up, m, _ = weights_io.import_unet(up, sd, video=False)
    print(f"sd unet: {len(m)} missing")
    vp, m, _ = weights_io.import_vae(vp, sd, video_decoder=False)
    print(f"sd vae: {len(m)} missing")
    csd = weights_io.load_torch_state_dict(args.ctrl_ckpt)
    cp, m, _ = weights_io.import_controlnet(cp, csd)
    print(f"controlnet: {len(m)} missing")

    scale = 0.18215
    latents = vae.apply({"params": vp}, img[None] * 2 - 1,
                        method=AutoencoderKL.encode).mode() * scale
    mask_l = jax.image.resize(mask[None, ..., None], (1, s, s, 1),
                              "nearest")
    masked = vae.apply({"params": vp},
                       (img * (1 - mask[..., None]))[None] * 2 - 1,
                       method=AutoencoderKL.encode).mode() * scale
    hint = depth[None]

    acp = DDPMSchedule().alphas_cumprod()
    all_sigmas = jnp.sqrt((1 - acp) / acp)

    def denoise_fn(x, sigmas_vec, cond):
        # eps-parameterized DDPM net behind an EDM-style wrapper.
        t_idx = jnp.argmin(jnp.abs(all_sigmas[None, :]
                                   - sigmas_vec[:, None]), axis=-1)
        c_in = 1.0 / jnp.sqrt(sigmas_vec ** 2 + 1.0)
        xin = x * c_in[:, None, None, None]
        x9 = jnp.concatenate([xin, jnp.tile(mask_l, (x.shape[0], 1, 1, 1)),
                              jnp.tile(masked, (x.shape[0], 1, 1, 1))],
                             axis=-1)
        emb = jnp.concatenate([
            jnp.repeat(text_embs[0:1], x.shape[0] // 2, axis=0),
            jnp.repeat(text_embs[1:2], x.shape[0] // 2, axis=0)], axis=0)
        h2 = jnp.tile(hint, (x.shape[0], 1, 1, 1))
        control = cnet.apply({"params": cp}, x9, h2,
                             t_idx.astype(jnp.float32), emb)
        control = [c * args.ctrl_scale for c in control]
        eps = unet.apply({"params": up}, x9, t_idx.astype(jnp.float32),
                         emb, control=control)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + args.cfg_scale * (eps_c - eps_u)
        eps2 = jnp.concatenate([eps_g, eps_g], axis=0)
        return x - eps2 * sigmas_vec[:, None, None, None]

    sigmas = jnp.concatenate(
        [edm.legacy_ddpm_sigmas(args.num_steps), jnp.zeros((1,))])

    out_dir = ws.ctrl_dir(args.scene_id)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(args.n_samples):
        key, k1 = jax.random.split(key)
        x0 = jax.random.normal(k1, latents.shape)
        x2 = jnp.concatenate([x0, x0], axis=0)
        sample = (samplers.unipc_sample if args.sampler == "unipc"
                  else samplers.dpmpp2m_sample)
        z = sample(denoise_fn, x2, {}, None, sigmas)[0:1]
        out = vae.apply({"params": vp}, z / scale, 1,
                        method=AutoencoderKL.decode)
        scene_io.save_image(os.path.join(out_dir, f"ctrl_{i}.png"),
                            np.asarray((out[0] + 1) / 2))
        print(f"sample {i} -> {out_dir}/ctrl_{i}.png")


if __name__ == "__main__":
    main()
