"""Sustained full-size ControlNet training on the real TPU, with a
mid-run checkpoint and a bit-exact resume proof.

The reference's deliverable is a 50-epoch/100k-step training run
(``/root/reference/svd_inpaint1/configs/training/svd_f_est_ctrl_simp1.yaml``
:196-214) with PL ModelCheckpoint saves and crash/melk recovery. One
measured step (scripts/bench_svd_train_step.py, round 3) proved the
2.94B stack compiles and fits; THIS script proves operability: a
sustained run of the exact per-device workload (512x384x14, bf16,
Adam + EMA, ControlNet-only grads) with

  - a loss trajectory over N steps on deterministic synthetic data,
  - a FULL mid-run train-state checkpoint (trainable + Adam state +
    EMA + step) saved to disk at --ckpt_at,
  - a final bit-exact digest (sha256 per leaf) of the whole train
    state, and
  - a --resume mode that starts a FRESH process (the "kill" in
    kill-and-resume), reloads the mid-run checkpoint, replays the
    remaining steps with the same data/key schedule, and verifies its
    final digest matches the uninterrupted run's EXACTLY.

Usage (axon TPU; first compile of the fwd+bwd step is 10-30 min):

    python -u scripts/svd_sustained_run.py --steps 100 --ckpt_at 50
    python -u scripts/svd_sustained_run.py --steps 100 --ckpt_at 50 --resume

Bit-exactness holds because every input is a deterministic function of
the global step (batches cycle a fixed synthetic set; per-step noise
keys are fold_in(key, step)), the frozen params re-init from the same
seed, and TPU/XLA execution is deterministic for a fixed program.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


# ---- train-state (tree) serialization ------------------------------
# np.savez round-trips builtin dtypes only; bf16 leaves ride as uint16
# views with a name prefix (ml_dtypes npz round-trip is not guaranteed).
_BF16 = "BF16__"


def _save_tree(path: str, trees: dict, meta: dict) -> None:
    """trees: name -> pytree. Leaves keyed name/NNN; structure is NOT
    stored (the loader rebuilds the same structure and refills leaves
    in tree order — stable for a fixed program)."""
    import jax
    out = {}
    for name, tree in trees.items():
        leaves = jax.tree_util.tree_leaves(tree)
        for i, leaf in enumerate(leaves):
            a = np.asarray(jax.device_get(leaf))
            key = f"{name}/{i:04d}"
            if a.dtype.name == "bfloat16":
                key = _BF16 + key
                a = a.view(np.uint16)
            out[key] = a
    out["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **out)


def _load_tree(path: str, templates: dict) -> tuple[dict, dict]:
    """templates: name -> pytree with the target structure; returns
    (name -> refilled pytree, meta)."""
    import jax
    import ml_dtypes
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    out = {}
    for name, tmpl in templates.items():
        leaves, treedef = jax.tree_util.tree_flatten(tmpl)
        new = []
        for i, leaf in enumerate(leaves):
            key = f"{name}/{i:04d}"
            if key in z.files:
                a = z[key]
            elif _BF16 + key in z.files:
                a = z[_BF16 + key].view(ml_dtypes.bfloat16)
            else:
                raise KeyError(f"missing leaf {key} in {path}")
            if tuple(a.shape) != tuple(np.shape(leaf)):
                raise ValueError(f"shape mismatch at {key}: "
                                 f"{a.shape} vs {np.shape(leaf)}")
            new.append(a)
        out[name] = jax.tree_util.tree_unflatten(treedef, new)
    return out, meta


def _digest(trees: dict) -> dict:
    """name -> [sha256(bytes) per leaf, in tree order]."""
    import jax
    d = {}
    for name, tree in trees.items():
        hs = []
        for leaf in jax.tree_util.tree_leaves(tree):
            a = np.asarray(jax.device_get(leaf))
            if a.dtype.name == "bfloat16":
                a = a.view(np.uint16)
            hs.append(hashlib.sha256(
                np.ascontiguousarray(a).tobytes()).hexdigest())
        d[name] = hs
    return d


def _make_batches(n_batches, t, size, cfg, h8, w8):
    """Deterministic synthetic dataset (cycled): numpy rng per batch."""
    batches = []
    for i in range(n_batches):
        rng = np.random.default_rng(1234 + i)
        latents = 0.18215 * rng.standard_normal(
            (1, t, h8, w8, 4)).astype(np.float32)
        cond = {
            "concat": 0.1 * rng.standard_normal(
                (1, t, h8, w8, 4)).astype(np.float32),
            "control_hint": rng.random(
                (1, t, size[0], size[1],
                 cfg.hint_channels)).astype(np.float32),
            "crossattn": rng.standard_normal(
                (1, t, 1, cfg.unet.context_dim)).astype(np.float32),
            "vector": rng.standard_normal(
                (1, t, cfg.unet.adm_in_channels)).astype(np.float32),
        }
        batches.append((latents, cond))
    return batches


def _sample_grid(eng, state, batches, key, out_dir, gstep, t, h8, w8):
    """ImageLogger parity for the sustained run: 25-step guided sample
    on the first synthetic batch + VideoDecoder + 4-wide PNG grid.
    Wrapped so a sampling-side OOM degrades to a log line instead of
    killing the training run."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multiview_inpaint_tpu.gs import scene_io
    from multiview_inpaint_tpu.pipelines.svd_test import to_grid
    try:
        lb, cb = batches[0]
        cond = {k: v[0] for k, v in cb.items()}
        uc = dict(cond)
        uc["crossattn"] = jnp.zeros_like(cond["crossattn"])
        uc["concat"] = jnp.zeros_like(cond["concat"])
        t0 = _time.time()
        z = eng.sample(state, key, cond, uc,
                       latent_shape=(t, h8, w8, 4))
        frames = np.asarray(eng.decode_first_stage(state, z,
                                                   timesteps=t))
        out = os.path.join(out_dir, "log_img",
                           f"samples_gs-{gstep:06d}.png")
        scene_io.save_image(out, to_grid(frames))
        log(f"sample grid {out} in {_time.time()-t0:.1f}s "
            f"(range [{frames.min():.2f}, {frames.max():.2f}])")
    except Exception as e:  # noqa: BLE001 — keep the run alive
        log(f"sample grid at step {gstep} FAILED: {type(e).__name__}: "
            f"{e}")
        return False
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--ckpt_at", type=int, default=50)
    p.add_argument("--n_batches", type=int, default=4)
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--size", type=int, nargs=2, default=[512, 384])
    p.add_argument("--out", default="/tmp/svd_sustained")
    p.add_argument("--resume", action="store_true",
                   help="fresh process: reload the --ckpt_at state, "
                        "replay the tail, verify the final digest")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="periodic rotated train-state checkpoints "
                        "(reference ModelCheckpoint every 5 epochs, "
                        "configs/training/*.yaml:196-214); 0 = off")
    p.add_argument("--keep_last", type=int, default=3,
                   help="rotation depth for --ckpt_every saves")
    p.add_argument("--sample_every", type=int, default=0,
                   help="fire a 25-step sample + VideoDecoder grid "
                        "every N steps (reference ImageLogger, "
                        "main.py:309-487); 0 = off")
    p.add_argument("--final_ema_eval", type=int, default=0,
                   help="end-of-run loss on N fixed batches under raw "
                        "vs EMA weights (LitEma swap at validation)")
    p.add_argument("--toy", action="store_true",
                   help="tiny model on CPU: validates the run/resume/"
                        "digest machinery without the TPU")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    resume_path = os.path.join(args.out, "resume_state.npz")
    digest_path = os.path.join(args.out, "final_digest.json")

    import jax
    if args.toy:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the --resume leg is a FRESH process (the
    # "kill" of kill-and-resume) and must not pay the ~14 min remote
    # compile of the 2.94B step a second time.
    cache_dir = os.path.join(args.out, "jit_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from multiview_inpaint_tpu.diffusion.engine import (EngineConfig,
                                                        SVDEngine,
                                                        init_engine)
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.svd_data_parallel import (
        apply_trainable, build_optimizer, make_dp_train_step,
        replicate_state, shard_svd_batch, trainable_params)

    dev = jax.devices()[0]
    log(f"backend={jax.default_backend()} device={dev} "
        f"mode={'RESUME' if args.resume else 'RUN'}")

    t = args.frames
    h8, w8 = args.size[0] // 8, args.size[1] // 8
    if args.toy:
        from multiview_inpaint_tpu.diffusion.unet import UNetConfig
        from multiview_inpaint_tpu.diffusion.vae import VAEConfig
        cfg = EngineConfig(
            unet=UNetConfig(in_channels=8, model_channels=32,
                            out_channels=4, num_res_blocks=1,
                            attention_resolutions=(1,),
                            channel_mult=(1, 2), num_head_channels=16,
                            context_dim=16, adm_in_channels=768,
                            out_zero_init=False),
            vae=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4),
            num_frames=t, compute_dtype="bfloat16", remat="all")
    else:
        from multiview_inpaint_tpu.diffusion.unet import UNetConfig
        # out_zero_init=False: this run trains from RANDOM init (no
        # SVD weights in the env) — with the parity zero-init out conv
        # the whole model is gradient-dead and the "training" would be
        # a numerical no-op (perf identical, learning zero).
        cfg = EngineConfig(num_frames=t, compute_dtype="bfloat16",
                           remat="all",
                           unet=UNetConfig(out_zero_init=False))
    eng = SVDEngine(cfg)

    t0 = time.time()
    state = init_engine(cfg, jax.random.key(0), latent_hw=(h8, w8),
                        param_dtype="bfloat16")
    log(f"init: {sum(x.size for x in jax.tree_util.tree_leaves(state))/1e9:.2f}B "
        f"params in {time.time()-t0:.1f}s")

    optimizer = build_optimizer(1e-4)
    trainable = trainable_params(state)
    opt_state = optimizer.init(trainable)
    ema = jax.tree_util.tree_map(jnp.copy, trainable)
    step_fn = make_dp_train_step(eng, optimizer, ema_decay=0.9999)

    start_step = 0
    losses = []
    if args.resume:
        log(f"loading resume state: {resume_path}")
        loaded, meta = _load_tree(resume_path, {
            "trainable": trainable, "opt": opt_state, "ema": ema})
        trainable, opt_state, ema = (loaded["trainable"], loaded["opt"],
                                     loaded["ema"])
        state = apply_trainable(state, trainable)
        start_step = int(meta["step"])
        losses = list(meta["losses"])
        log(f"resumed at step {start_step} "
            f"(saved loss[-1]={losses[-1]:.5f})")

    mesh = make_mesh(1)
    state = replicate_state(state, mesh)
    opt_state = replicate_state(opt_state, mesh)
    ema = replicate_state(ema, mesh)

    batches = _make_batches(args.n_batches, t, args.size, cfg, h8, w8)
    key = jax.random.key(1)

    def mem(tag):
        try:
            s = dev.memory_stats()
            log(f"[mem {tag}] in_use={s['bytes_in_use']/2**30:.2f}G "
                f"peak={s['peak_bytes_in_use']/2**30:.2f}G")
            return s["peak_bytes_in_use"]
        except Exception as e:
            log(f"[mem {tag}] unavailable: {e}")
            return None

    times = []
    with mesh:
        sharded = [shard_svd_batch(lb, cb, mesh) for lb, cb in batches]
        log("compiling train step ...")
        for gstep in range(start_step, args.steps):
            lb, cb = sharded[gstep % args.n_batches]
            t0 = time.time()
            # One retry on RESOURCE_EXHAUSTED: a failed full-size
            # sample grid leaves HBM committed long enough that even a
            # 4-byte fold_in upload OOMs on the next line (measured:
            # the first 400-step run died exactly there). gc + backoff
            # lets the backend release the sampler's buffers.
            for attempt in (0, 1):
                try:
                    k = jax.random.fold_in(key, gstep)
                    state, opt_state, ema, loss = step_fn(
                        state, opt_state, ema, k, lb, cb)
                    loss = float(jax.block_until_ready(loss))
                    break
                except Exception as e:  # noqa: BLE001
                    if attempt or "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    log(f"step {gstep} hit {type(e).__name__} "
                        f"(post-sample HBM pressure?); gc+30s retry")
                    import gc
                    gc.collect()
                    time.sleep(30)
            dt = time.time() - t0
            losses.append(loss)
            if gstep == start_step:
                log(f"step {gstep}: {dt:.1f}s (incl. compile) "
                    f"loss={loss:.5f}")
                mem("after first step")
            else:
                times.append(dt)
                if gstep % 10 == 0 or gstep == args.steps - 1:
                    log(f"step {gstep}: {dt*1000:.1f} ms "
                        f"loss={loss:.5f}")
            if args.ckpt_every and (gstep + 1) % args.ckpt_every == 0:
                path = os.path.join(args.out,
                                    f"ckpt_step={gstep + 1:06d}.npz")
                ts = time.time()
                _save_tree(path, {"trainable": trainable_params(state),
                                  "opt": opt_state, "ema": ema},
                           {"step": gstep + 1, "losses": losses})
                log(f"ckpt {path} "
                    f"({os.path.getsize(path)/2**30:.2f} GiB, "
                    f"{time.time()-ts:.1f}s)")
                kept = sorted(f for f in os.listdir(args.out)
                              if f.startswith("ckpt_step="))
                for old in kept[:-args.keep_last]:
                    os.remove(os.path.join(args.out, old))
                    log(f"rotated out {old}")
            if args.sample_every and (gstep + 1) % args.sample_every == 0:
                if not _sample_grid(eng, state, batches,
                                    jax.random.key(7), args.out,
                                    gstep + 1, t, h8, w8):
                    # Full-size sampling alongside the train state does
                    # not fit 16 GB (2.94B bf16 params + Adam + EMA +
                    # CFG-doubled sampler activations) — disable
                    # further grids instead of re-OOMing every event;
                    # grids at full size belong in a separate process
                    # over a saved checkpoint (svd_test does exactly
                    # that).
                    log("disabling further sample grids this run")
                    args.sample_every = 0
                    import gc
                    gc.collect()
                    time.sleep(15)
            if (not args.resume and gstep + 1 == args.ckpt_at):
                log(f"saving mid-run train state at step {gstep + 1}")
                ts = time.time()
                _save_tree(resume_path,
                           {"trainable": trainable_params(state),
                            "opt": opt_state, "ema": ema},
                           {"step": gstep + 1, "losses": losses})
                log(f"saved {os.path.getsize(resume_path)/2**30:.2f} GiB "
                    f"in {time.time()-ts:.1f}s: {resume_path}")
        peak = mem("final")
        if args.final_ema_eval:
            import jax.numpy as _jnp

            @jax.jit
            def eval_loss(st0, tr, k, lbv, cbv):
                def per_video(kk, lat, cond):
                    st = apply_trainable(st0, tr)
                    return eng.loss(st, kk, lat, cond)
                keys = jax.random.split(k, lbv.shape[0])
                return _jnp.mean(jax.vmap(per_video)(keys, lbv, cbv))

            raw = trainable_params(state)
            tot = {"raw": 0.0, "ema": 0.0}
            nb = min(args.final_ema_eval, len(sharded))
            for i in range(nb):
                lbv, cbv = sharded[i]
                k = jax.random.fold_in(jax.random.key(99), i)
                tot["raw"] += float(eval_loss(state, raw, k, lbv, cbv))
                tot["ema"] += float(eval_loss(state, ema, k, lbv, cbv))
            log(f"final_ema_eval batches={nb} "
                f"raw={tot['raw']/nb:.5f} ema={tot['ema']/nb:.5f}")

    med = sorted(times)[len(times) // 2] if times else float("nan")
    dig = _digest({"trainable": trainable_params(state),
                   "opt": opt_state, "ema": ema})

    if args.resume:
        with open(digest_path) as f:
            ref = json.load(f)
        mismatch = []
        for name in dig:
            for i, (a, b) in enumerate(zip(dig[name],
                                           ref["digest"][name])):
                if a != b:
                    mismatch.append(f"{name}/{i:04d}")
        ok = not mismatch and losses == ref["losses"]
        log(json.dumps({
            "metric": "svd_sustained_resume_bitexact", "ok": ok,
            "mismatched_leaves": mismatch[:10],
            "n_mismatch": len(mismatch),
            "loss_match": losses == ref["losses"],
            "resumed_from": start_step, "steps": args.steps,
            "median_step_ms": round(med * 1000, 1)}))
        sys.exit(0 if ok else 1)
    else:
        with open(digest_path, "w") as f:
            json.dump({"digest": dig, "losses": losses,
                       "steps": args.steps, "ckpt_at": args.ckpt_at},
                      f)
        log(json.dumps({
            "metric": "svd_sustained_run", "steps": args.steps,
            "median_step_ms": round(med * 1000, 1),
            "it_per_s": round(1.0 / med, 3) if times else None,
            "loss_first": round(losses[0], 5),
            "loss_last": round(losses[-1], 5),
            "peak_hbm_gib": round(peak / 2**30, 2) if peak else None,
            "digest_path": digest_path}))


if __name__ == "__main__":
    main()
