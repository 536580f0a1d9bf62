"""Measure ONE full-size ControlNet training step on the real TPU.

The reference's central workload is training the video ControlNet for 50
epochs at 512x384x14 on 4 GPUs, batch 1 per device
(``/root/reference/svd_inpaint1/configs/training/svd_f_est_ctrl_simp1.yaml``
:196-214).  This script runs exactly that per-device step — the full
2.94B-param stack (UNet + ControlNet + CLIP-H + VAE), bf16 params +
bf16 compute, Adam + EMA, the same jitted dp step ``svd_train`` uses —
on synthetic data, and reports step time + HBM high-water + a pruned
ControlNet checkpoint, proving the training path is viable on one chip.

    python -u scripts/bench_svd_train_step.py [--remat] [--steps 5]

Run on the axon TPU (do NOT force cpu).  First compile is slow
(remote compile of the 2.94B-stack fwd+bwd: expect 10-30 min).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--remat", nargs="?", const="all", default=False,
                   choices=["all", "attn"],
                   help="rematerialization: 'all' blocks or 'attn' "
                        "(transformer blocks only)")
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--ckpt_out", default="/tmp/svd_train_bench")
    args = p.parse_args()

    from multiview_inpaint_tpu.diffusion import checkpoint as ckpt
    from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                        SVDEngine,
                                                        init_engine)
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.svd_data_parallel import (
        build_optimizer, make_dp_train_step, replicate_state,
        shard_svd_batch, trainable_params)

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev}")

    t = args.frames
    h8, w8 = args.size[0] // 8, args.size[1] // 8
    cfg = EngineConfig(num_frames=t, compute_dtype="bfloat16",
                       remat=args.remat)
    eng = SVDEngine(cfg)

    t0 = time.time()
    state = init_engine(cfg, jax.random.key(0), latent_hw=(h8, w8),
                        param_dtype="bfloat16")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state))
    log(f"init: {n_params/1e9:.2f}B params in {time.time()-t0:.1f}s")

    optimizer = build_optimizer(1e-4)
    trainable = trainable_params(state)
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
    log(f"trainable (controlnet): {n_train/1e9:.2f}B params")
    opt_state = optimizer.init(trainable)
    ema_decay = None if args.no_ema else 0.9999
    ema = jax.tree_util.tree_map(jnp.copy, trainable)
    step_fn = make_dp_train_step(eng, optimizer, ema_decay=ema_decay)

    mesh = make_mesh(1)
    state = replicate_state(state, mesh)
    opt_state = replicate_state(opt_state, mesh)
    ema = replicate_state(ema, mesh)

    key = jax.random.key(1)
    # Synthetic batch, exact training shapes (batch 1 per device).
    latents_b = 0.18215 * jax.random.normal(key, (1, t, h8, w8, 4))
    cond_b = {
        "concat": 0.1 * jax.random.normal(key, (1, t, h8, w8, 4)),
        "control_hint": jax.random.uniform(
            key, (1, t, args.size[0], args.size[1], cfg.hint_channels)),
        "crossattn": jax.random.normal(key, (1, t, 1,
                                             cfg.unet.context_dim)),
        "vector": jax.random.normal(key, (1, t,
                                          cfg.unet.adm_in_channels)),
    }

    def mem(tag):
        try:
            s = dev.memory_stats()
            log(f"[mem {tag}] in_use={s['bytes_in_use']/2**30:.2f}G "
                f"peak={s['peak_bytes_in_use']/2**30:.2f}G")
            return s["peak_bytes_in_use"]
        except Exception as e:  # axon may not expose stats
            log(f"[mem {tag}] unavailable: {e}")
            return None

    mem("after init")
    with mesh:
        latents_b, cond_b = shard_svd_batch(latents_b, cond_b, mesh)
        log("compiling train step ...")
        t0 = time.time()
        state, opt_state, ema, loss = step_fn(
            state, opt_state, ema, key, latents_b, cond_b)
        loss = float(jax.block_until_ready(loss))
        log(f"first step (compile+run): {time.time()-t0:.1f}s "
            f"loss={loss:.4f}")
        peak = mem("after step 1")

        times = []
        for i in range(args.steps):
            k = jax.random.fold_in(key, i)
            t0 = time.time()
            state, opt_state, ema, loss = step_fn(
                state, opt_state, ema, k, latents_b, cond_b)
            loss = float(jax.block_until_ready(loss))
            dt = time.time() - t0
            times.append(dt)
            log(f"step {i}: {dt*1000:.1f} ms loss={loss:.4f}")

    best = min(times)
    med = sorted(times)[len(times) // 2]
    mem("final")
    # Prove the artifact path: save the pruned (ControlNet-only) ckpt,
    # like svd_train's on_save_checkpoint parity.
    os.makedirs(args.ckpt_out, exist_ok=True)
    path = os.path.join(args.ckpt_out, "controlnet_ema.npz")
    ckpt.save_params(path, jax.device_get(ema["controlnet"]))
    log(f"saved pruned ckpt: {path} "
        f"({os.path.getsize(path)/2**30:.2f} GiB)")
    log(json.dumps({
        "metric": "svd_train_step_ms", "value": round(med * 1000, 1),
        "best_ms": round(best * 1000, 1),
        "it_per_s": round(1.0 / med, 3),
        "remat": args.remat, "ema": ema_decay is not None,
        "peak_hbm_gib": round(peak / 2**30, 2) if peak else None,
        "params_b": round(n_params / 1e9, 2), "loss": loss}))


if __name__ == "__main__":
    main()
