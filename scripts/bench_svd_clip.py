"""End-to-end SVD inpainting clip benchmark on the real TPU.

One 25-step guided sample (CFG-doubled 28-frame batch through
UNet+ControlNet) + VideoDecoder decode at 512x384x14 — the reference's
``svd_test`` per-clip inference workload. Round-2 measured 9.60 s
(bf16 + custom flash attention + broadcast upsampling); run this after
kernel changes to keep the claim honest.

    python -u scripts/bench_svd_clip.py [--steps 25]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                        SVDEngine,
                                                        init_engine)

    t = args.frames
    h8, w8 = args.size[0] // 8, args.size[1] // 8
    cfg = EngineConfig(num_frames=t, compute_dtype="bfloat16",
                       num_steps=args.steps)
    eng = SVDEngine(cfg)
    t0 = time.time()
    state = init_engine(cfg, jax.random.key(0), latent_hw=(h8, w8),
                        param_dtype="bfloat16")
    print(f"init {time.time()-t0:.1f}s", flush=True)

    key = jax.random.key(1)
    cond = {
        "concat": 0.1 * jax.random.normal(key, (t, h8, w8, 4)),
        "control_hint": jax.random.uniform(
            key, (t, args.size[0], args.size[1], cfg.hint_channels)),
        "crossattn": jax.random.normal(key, (t, 1, cfg.unet.context_dim)),
        "vector": jax.random.normal(key, (t, cfg.unet.adm_in_channels)),
    }
    uc = dict(cond)
    uc["crossattn"] = jnp.zeros_like(cond["crossattn"])
    uc["concat"] = jnp.zeros_like(cond["concat"])

    @jax.jit
    def sample(state, key):
        return eng.sample(state, key, cond, uc,
                          latent_shape=(t, h8, w8, 4))

    @jax.jit
    def decode(state, z):
        return eng.decode_first_stage(state, z, timesteps=t)

    print("compiling sample ...", flush=True)
    t0 = time.time()
    z = jax.block_until_ready(sample(state, key))
    print(f"sample compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    frames = jax.block_until_ready(decode(state, z))
    print(f"decode compile+run {time.time()-t0:.1f}s "
          f"out={frames.shape}", flush=True)

    ts, td = [], []
    for i in range(3):
        t0 = time.time()
        z = jax.block_until_ready(sample(state, jax.random.fold_in(key,
                                                                   i)))
        ts.append(time.time() - t0)
        t0 = time.time()
        frames = jax.block_until_ready(decode(state, z))
        td.append(time.time() - t0)
        print(f"clip {i}: sample {ts[-1]:.2f}s decode {td[-1]:.2f}s",
              flush=True)
    import json
    print(json.dumps({
        "metric": "svd_clip_s",
        "value": round(min(ts) + min(td), 2),
        "sample_s": round(min(ts), 2), "decode_s": round(min(td), 2),
        "steps": args.steps}))


if __name__ == "__main__":
    main()
