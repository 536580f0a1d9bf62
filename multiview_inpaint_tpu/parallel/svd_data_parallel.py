"""SPMD data-parallel ControlNet training for the SVD inpainter.

The reference trains with PyTorch-Lightning DDP over 4 GPUs (batch 1 per
device, gradient all-reduce; SURVEY.md §2.6). TPU-native: the *video
batch* [B, T, ...] is sharded over the ``data`` mesh axis, parameters are
replicated, and one jitted step vmaps the per-video loss — XLA turns the
gradient mean into an ICI psum. Optional EMA of the ControlNet params
(the reference's LitEma) and optax gradient accumulation ride along.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.engine import EngineState, SVDEngine


_LABEL_EMB_KEYS = ("label_emb_0_0", "label_emb_0_2")


def trainable_params(state: EngineState,
                     train_label_emb: bool = False) -> Dict:
    """The reference's two trainable sets: ControlNet only (SVDEngine,
    sd_locked) or ControlNet + the UNet's label_emb
    (VideoDiffusionEngine variant, csvd.py:604-605)."""
    t = {"controlnet": state.controlnet}
    if train_label_emb:
        t["label_emb"] = {k: state.unet[k] for k in _LABEL_EMB_KEYS
                          if k in state.unet}
    return t


def apply_trainable(state: EngineState, trainable: Dict) -> EngineState:
    new = dataclasses.replace(state, controlnet=trainable["controlnet"])
    if "label_emb" in trainable:
        unet = dict(new.unet)
        unet.update(trainable["label_emb"])
        new = dataclasses.replace(new, unet=unet)
    return new


def make_dp_train_step(eng: SVDEngine, optimizer,
                       ema_decay: Optional[float] = None,
                       train_label_emb: bool = False,
                       use_warp: bool = False):
    """Returns step(state, opt_state, ema, key, latents_b, cond_b).

    latents_b [B, T, h, w, 4]; cond_b: dict with leading batch dim B for
    every leaf ([B, T, ...] for per-frame keys, [B, ...] otherwise
    already repeated per frame). ``opt_state``/``ema`` are over the
    trainable_params() tree.

    ``use_warp`` enables the warp-consistency term (reference
    InpaintDiffusionLoss2): cond_b must then carry ``hit_map``
    [B, T-1, h, w] and ``uv_ind`` [B, T-1, 4, h*w] (from
    ``data.svd_dataset.WarpSVDForwardDataset``); they are split off the
    conditioning dict and routed into ``eng.loss(warp=...)``.
    """

    # Donating state/opt_state/ema lets XLA alias the updated trees onto
    # the inputs: without it the full-size (2.94B-param) step's output
    # was a fresh 8.2 GiB allocation sharing 0 bytes with its arguments
    # — more than a third of the chip's HBM (the OOM dump said so
    # verbatim). Callers always rebind, so the donation is safe.
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(state: EngineState, opt_state, ema, key, latents_b, cond_b):
        b = latents_b.shape[0]
        keys = jax.random.split(key, b)

        def loss_fn(trainable):
            def per_video(k, lat, cond):
                st = apply_trainable(state, trainable)
                warp = None
                if use_warp:
                    cond = dict(cond)
                    warp = {"hit_map": cond.pop("hit_map"),
                            "uv_ind": cond.pop("uv_ind")}
                return eng.loss(st, k, lat, cond, warp=warp)

            losses = jax.vmap(per_video)(keys, latents_b, cond_b)
            return jnp.mean(losses)

        params = trainable_params(state, train_label_emb)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_state = apply_trainable(state, new_params)
        if ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                ema, new_params)
        return new_state, opt_state, ema, loss

    return step


def shard_svd_batch(latents_b, cond_b, mesh: Mesh):
    def put(a):
        return jax.device_put(a, NamedSharding(
            mesh, P("data", *([None] * (a.ndim - 1)))))
    return put(latents_b), jax.tree_util.tree_map(put, cond_b)


def replicate_state(state, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), state)


def build_optimizer(lr: float = 1e-4, schedule: str = "constant",
                    warmup_steps: int = 0, total_steps: int = 100_000,
                    accumulate: int = 1):
    """Reference knobs: base lr 1e-4, LambdaLinear/WarmUpCosine schedules
    (sgm/lr_scheduler.py), accumulate_grad_batches."""
    if schedule == "warmup_cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps)
    elif schedule == "linear":
        sched = optax.linear_schedule(lr, 0.0, total_steps, warmup_steps)
    else:
        sched = lr
    opt = optax.adam(sched)
    if accumulate > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate)
    return opt
