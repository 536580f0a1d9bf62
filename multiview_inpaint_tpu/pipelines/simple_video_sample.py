"""Plain SVD image-to-video sampling — reference
``scripts/sampling/simple_video_sample.py`` / demo apps.

Takes one conditioning image, runs the (uncontrolled) VideoUNet with the
standard SVD conditioning (CLIP tokens, VAE latents, fps/motion fourier
vector) through the Euler-EDM sampler, writes frames + a GIF. With
``--hint_dir`` it applies the ControlNet exactly like svd_test (making
this the general demo entry point).

    python -m multiview_inpaint_tpu.pipelines.simple_video_sample \
        --image input.png --base_ckpt svd_weights.npz --out out_dir

Split into :func:`load_model` (engine + checkpoint, expensive) and
:func:`sample_clip` (one clip) so long-lived callers — the browser demo
``pipelines/demo_app.py``, matching the reference gradio app's cached
``load_model`` — pay the weight load once.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import checkpoint as ckpt
from ..diffusion import edm, samplers
from ..diffusion.engine import EngineConfig, SVDEngine, init_engine
from ..gs import scene_io


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="video_out")
    p.add_argument("--base_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--fps_id", type=float, default=6)
    p.add_argument("--motion_bucket_id", type=float, default=127)
    p.add_argument("--cond_aug", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--param_dtype", default="bfloat16",
                   help="weight storage dtype for the full-size "
                        "model (2.9B params need bf16 on 16GB chips)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny_model", action="store_true")
    p.add_argument("--safety_heads", default=None,
                   help="npz with 'nsfw'/'watermark' probe rows "
                        "([D+1] weights+bias over CLIP image "
                        "embeddings); frames above threshold are "
                        "blurred (reference DeepFloydDataFiltering in "
                        "simple_video_sample.py)")
    p.add_argument("--safety_threshold", type=float, default=0.5)
    return p


def load_model(args):
    """Engine + state (checkpoint imported once). Returns (eng, state,
    cfg) — reusable across :func:`sample_clip` calls."""
    if args.tiny_model:
        import dataclasses as _dc
        from ..diffusion.clip_vit import TINY_VIT
        from ..diffusion.unet import UNetConfig
        from ..diffusion.vae import VAEConfig
        cfg = EngineConfig(
            unet=UNetConfig(model_channels=32, num_res_blocks=1,
                            attention_resolutions=(1,),
                            channel_mult=(1, 2), num_head_channels=16,
                            context_dim=16),
            vae=VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
            vit=_dc.replace(TINY_VIT, output_dim=16),
            num_frames=args.num_frames, num_steps=args.num_steps)
    else:
        cfg = EngineConfig(num_frames=args.num_frames,
                           num_steps=args.num_steps,
                           compute_dtype=args.compute_dtype)
    eng = SVDEngine(cfg)
    state = init_engine(cfg, jax.random.key(args.seed),
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
            merged, missing, _ = ckpt.merge_params(
                {"unet": state.unet, "vae": state.vae,
                 "clip": state.clip}, loaded)
            state = dataclasses.replace(state, **merged)
            print(f"base ckpt: {len(missing)} missing")
    return eng, state, cfg


def sample_clip(eng, state, cfg, args):
    """Condition on ``args.image``, sample one clip, write frames + GIF
    into ``args.out``. ``num_frames``/``size`` must match the loaded
    model's (they shape the compiled graphs)."""
    img = scene_io.load_image(args.image,
                              (args.size[1], args.size[0])) * 2 - 1
    t = cfg.num_frames
    batch = {
        "cond_frames_without_noise": jnp.asarray(img)[None],
        "cond_frames": jnp.asarray(img)[None],
        "fps_id": jnp.asarray([args.fps_id]),
        "motion_bucket_id": jnp.asarray([args.motion_bucket_id]),
        "cond_aug": jnp.asarray([args.cond_aug]),
    }
    key = jax.random.key(args.seed)
    k1, k2 = jax.random.split(key)
    conditioner = eng.conditioner(state)
    c = conditioner(batch, key=k1)
    uc = conditioner(batch, force_zero=True)
    from ..diffusion.conditioners import repeat_cond_per_frame
    c = repeat_cond_per_frame(c, t, keys=("crossattn", "concat", "vector"))
    uc = repeat_cond_per_frame(uc, t,
                               keys=("crossattn", "concat", "vector"))

    # Uncontrolled UNet: bypass apply_model's ControlNet.
    def denoise(x, sigmas, cond):
        def net(x_scaled, c_noise):
            ind = jnp.zeros((x_scaled.shape[0] // t, t))
            xc = jnp.concatenate([x_scaled, cond["concat"]], axis=-1)
            return eng.unet.apply({"params": state.unet}, xc, c_noise,
                                  cond.get("crossattn"),
                                  cond.get("vector"),
                                  num_video_frames=t,
                                  image_only_indicator=ind)
        return edm.denoise(net, x, sigmas, scaling=cfg.scaling)

    from ..diffusion.guiders import LinearPredictionGuider
    guider = LinearPredictionGuider(max_scale=cfg.cfg_max,
                                    min_scale=cfg.cfg_min, num_frames=t,
                                    additional_cond_keys=())
    sigmas = jnp.concatenate([edm.edm_sigmas(cfg.num_steps, cfg.sigma_min,
                                             cfg.sigma_max),
                              jnp.zeros((1,))])
    x = jax.random.normal(k2, (t, args.size[0] // 8, args.size[1] // 8, 4))
    z = samplers.euler_edm_sample(denoise, x, c, uc, sigmas, guider=guider,
                                  key=k2)
    frames = np.array(eng.decode_first_stage(state, z, timesteps=t))
    if args.safety_heads:
        from ..diffusion.safety import SafetyFilter, load_heads
        filt = SafetyFilter(
            img_embed=lambda im: eng.clip_embed(
                state, jnp.asarray(im, jnp.float32)[None])[0],
            heads=load_heads(args.safety_heads),
            nsfw_threshold=args.safety_threshold,
            watermark_threshold=args.safety_threshold)
        flagged = 0
        for i in range(t):
            s = filt.scores(frames[i])
            if (s["nsfw"] > filt.nsfw_threshold
                    or s["watermark"] > filt.watermark_threshold):
                frames[i] = filt(frames[i])
                flagged += 1
        if flagged:
            print(f"safety filter blurred {flagged}/{t} frames")
    os.makedirs(args.out, exist_ok=True)
    for i in range(t):
        scene_io.save_image(os.path.join(args.out, f"{i:02d}.png"),
                            (frames[i] + 1) / 2)
    from .vis import main as vis_main
    vis_main(["--frames_dir", args.out,
              "--out", os.path.join(args.out, "video.gif")])
    print(f"{t} frames -> {args.out}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    eng, state, cfg = load_model(args)
    sample_clip(eng, state, cfg, args)


if __name__ == "__main__":
    main()
