"""Multi-view SVD inpainting inference — reference ``test.py`` + log grids.

For every (scene_case, ctrl, mode) item in the gs/ directory contract:
encode frames, build conditioning (CLIP tokens + VAE cond latents +
fourier vector + 7ch control hint), run the 25-step Euler-EDM sampler with
per-frame CFG 1.0->2.5, decode with the temporal VideoDecoder, and write
both the reference-compatible 4x4 log grid
(``log_img/test/samples_...png``) and per-frame outputs directly under
``inpainted/<scene>/<ctrl>/<mode>/NN.png`` (so ``divide_test`` becomes
optional).

    python -m multiview_inpaint_tpu.pipelines.svd_test \
        --data_root gs --ctrl_ckpt logs/simp1/checkpoints/epoch=000049.npz \
        [--base_ckpt svd_weights.npz] [--out gs/inpainted]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.svd_dataset import GSVideoForwardDataset
from ..diffusion import checkpoint as ckpt
from ..diffusion.engine import EngineConfig, SVDEngine, init_engine
from ..gs import scene_io


def to_grid(frames: np.ndarray, ncol: int = 4, pad: int = 2) -> np.ndarray:
    """[T, H, W, 3] in [-1,1] -> padded grid image in [0,1] (the
    torchvision make_grid layout divide_test.py expects)."""
    t, h, w, c = frames.shape
    nrow = math.ceil(t / ncol)
    grid = np.zeros((nrow * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    np.float32)
    for i in range(t):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y:y + h, x:x + w] = (frames[i] + 1) / 2
    return np.clip(grid, 0, 1)


def _engine_config(args) -> EngineConfig:
    if args.tiny_model:
        import dataclasses as _dc

        from ..diffusion.clip_vit import TINY_VIT
        from ..diffusion.unet import UNetConfig
        from ..diffusion.vae import VAEConfig
        return EngineConfig(
            unet=UNetConfig(model_channels=32, num_res_blocks=1,
                            attention_resolutions=(1,),
                            channel_mult=(1, 2), num_head_channels=16,
                            context_dim=16),
            vae=VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
            vit=_dc.replace(TINY_VIT, output_dim=16),
            num_frames=args.num_frames, num_steps=args.num_steps)
    return EngineConfig(num_frames=args.num_frames,
                        num_steps=args.num_steps,
                        compute_dtype=args.compute_dtype)


def run(args):
    cfg = _engine_config(args)
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
            merged, missing, unexpected = ckpt.merge_params(
                {"unet": state.unet, "vae": state.vae,
                 "clip": state.clip}, loaded)
            state = dataclasses.replace(state, **merged)
            print(f"base ckpt: {len(missing)} missing, "
                  f"{len(unexpected)} unexpected")
    if args.ctrl_ckpt:
        cn, missing, unexpected = ckpt.merge_params(
            state.controlnet, ckpt.load_params(args.ctrl_ckpt))
        state = dataclasses.replace(state, controlnet=cn)
        print(f"ctrl ckpt: {len(missing)} missing, "
              f"{len(unexpected)} unexpected")

    sp_denoise = None
    if getattr(args, "shard_frames", False):
        import jax as _jax
        t = args.num_frames
        n_avail = len(_jax.devices())
        n_dev = max(k for k in range(1, n_avail + 1) if t % k == 0)
        if n_dev > 1 and args.sampling == "plain":
            from ..parallel import make_mesh
            from ..parallel.svd_inference_parallel import (
                make_frame_sharded_denoiser)
            sp_denoise = make_frame_sharded_denoiser(
                eng, state, make_mesh(n_dev))
            print(f"sequence-parallel sampling: {t} frames over "
                  f"{n_dev} devices")
        else:
            print("shard_frames ignored (one usable device or "
                  "non-plain sampling)")

    ds = GSVideoForwardDataset(args.data_root, size=args.size,
                               num_frames=args.num_frames,
                               modes=args.modes,
                               iteration=args.iteration)
    key = jax.random.key(args.seed)
    grid_dir = os.path.join(args.logdir, "log_img", "test")
    os.makedirs(grid_dir, exist_ok=True)
    for index in range(len(ds)):
        scene, ctrl, mode = ds.meta(index)
        batch = {k: jnp.asarray(v) for k, v in ds[index].items()
                 if k != "num_video_frames"}
        key, k1, k2 = jax.random.split(key, 3)
        cond = eng.prepare_cond(state, batch, key=k1)
        uc = eng.prepare_cond(state, batch, unconditional=True)
        uc["control_hint"] = cond["control_hint"]
        t = args.num_frames
        h8, w8 = args.size[0] // 8, args.size[1] // 8
        if args.sampling in ("blended", "inversion"):
            # background latents + latent-space mask (1 = resample)
            bg_z = eng.encode_first_stage(state, batch["jpg"])
            m = jax.image.resize(batch["masks"], (t, h8, w8, 1),
                                 "nearest")
            m = jnp.broadcast_to(m, bg_z.shape)
            fn = (eng.sample_blended if args.sampling == "blended"
                  else eng.sample_inversion)
            z = fn(state, k2, cond, uc, bg_z, m)
        else:
            z = eng.sample(state, k2, cond, uc,
                           latent_shape=(t, h8, w8, 4),
                           denoise_fn=sp_denoise)
        frames = eng.decode_first_stage(state, z, timesteps=t)
        frames = np.asarray(frames)
        # reference-compatible grid
        name = f"samples_gs-{index:06d}_e-000000_b-{index:06d}.png"
        scene_io.save_image(os.path.join(grid_dir, name), to_grid(frames))
        # direct per-frame outputs
        ctrl_name = os.path.splitext(ctrl)[0]
        out_dir = os.path.join(args.out or os.path.join(args.data_root,
                                                        "inpainted"),
                               scene, ctrl_name, mode)
        for i in range(t):
            scene_io.save_image(os.path.join(out_dir, f"{i:02d}.png"),
                                (frames[i] + 1) / 2)
        print(f"[{index + 1}/{len(ds)}] {scene}/{ctrl_name}/{mode} -> "
              f"{out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--logdir", default="logs/test")
    p.add_argument("--out", default=None)
    p.add_argument("--base_ckpt", default=None)
    p.add_argument("--ctrl_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=14)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--modes", nargs="+", default=["x1", "x2"])
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--sampling", default="plain",
                   choices=["plain", "blended", "inversion"],
                   help="plain=SVDEngine, blended=VideoDiffusionEngine2 "
                        "per-step latent blending, inversion="
                        "EulerEDMSampler3 DDIM-inversion resampling")
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--param_dtype", default="bfloat16",
                   help="weight storage dtype for the full-size "
                        "model (2.9B params need bf16 on 16GB chips)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny_model", action="store_true",
                   help="debug-size model for smoke tests")
    p.add_argument("--dump_latents", default=None, metavar="DIR",
                   help="debug: write every sampler step's latent as "
                        ".npy under DIR (the reference EDMSampler3's "
                        "np.save affordance, sampling.py:271-354)")
    p.add_argument("--shard_frames", action="store_true",
                   help="sequence-parallel sampling: shard the clip's "
                        "frames over all devices (largest device count "
                        "dividing num_frames; plain sampling only)")
    args = p.parse_args(argv)
    if args.dump_latents:
        from ..diffusion.samplers import latent_dump
        with latent_dump(args.dump_latents):
            run(args)
    else:
        run(args)


if __name__ == "__main__":
    main()
