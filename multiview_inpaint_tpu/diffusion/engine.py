"""SVDEngine — the paper's ControlNet-augmented multi-view SVD model.

Capability parity with ``models/csvd.py`` SVDEngine (:1018-1464) and the
DiffusionEngine plumbing (``sgm/models/diffusion.py``), functional-style:
parameters live in an :class:`EngineState` pytree, all compute paths are
pure jitted functions.

- ``apply_model`` (:1086-1152): concat [x, cond_concat] (4+4 ch), run the
  ControlNet on the 7-ch hint, feed its 13 residuals (x control_scales)
  into the UNet.
- ``denoise``: v-scaling with EDM c_noise around ``apply_model``.
- ``sample`` (:1258-1277): randn latents -> 25-step Euler-EDM with the
  per-frame LinearPredictionGuider (sigma_max 700).
- ControlNet-only training (``configure_optimizers`` :1215-1241 with
  sd_locked): the train step differentiates w.r.t. controlnet params only.
- ``init_controlnet_from_unet`` == ``init_from_unet``: encoder weights
  copied from the UNet trunk, hint block + zero convs fresh.
- first stage: KL-VAE encode (scale 0.18215) / VideoDecoder decode, both
  chunked at the caller's discretion (XLA handles the batch fine on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from . import edm, losses as loss_mod, samplers
from .clip_vit import CLIPVisionTower, ViTConfig
from .conditioners import Conditioner, repeat_cond_per_frame
from .controlnet import ControlNet
from .guiders import LinearPredictionGuider
from .unet import UNetConfig, VideoUNet
from .vae import AutoencoderKL, VAEConfig

SCALE_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    vit: ViTConfig = ViTConfig()
    hint_channels: int = 7
    num_frames: int = 14
    num_steps: int = 25
    sigma_max: float = 700.0
    sigma_min: float = 0.002
    cfg_min: float = 1.0
    cfg_max: float = 2.5
    control_scales: float = 1.0
    scaling: str = "v_edm_cnoise"
    compute_dtype: str = "float32"  # "bfloat16" for mixed precision
    remat: bool | str = False       # use_checkpoint parity: True/"all"
                                    # remats every block, "attn" only the
                                    # transformer blocks (see UNetConfig)
    # scalar batch keys fourier-embedded into the vector cond (SV3D-style
    # pose conditioning swaps in polars_rad/azimuths_rad/rad; the UNet's
    # adm_in_channels must equal 256*len(vector_keys)).
    vector_keys: tuple = ("fps_id", "motion_bucket_id", "cond_aug")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EngineState:
    unet: dict          # frozen (sd_locked)
    controlnet: dict    # trainable
    vae: dict           # frozen
    clip: dict          # frozen


def build_models(cfg: EngineConfig):
    # Engine-level remat threads into the UNet config so each res/attn
    # block (in both the UNet and the ControlNet trunk) rematerializes.
    ucfg = dataclasses.replace(cfg.unet, remat=cfg.remat or cfg.unet.remat)
    return (VideoUNet(ucfg), ControlNet(ucfg, cfg.hint_channels),
            AutoencoderKL(cfg.vae), CLIPVisionTower(cfg.vit))


def init_engine(cfg: EngineConfig, key: jax.Array,
                latent_hw: Tuple[int, int] = (64, 48),
                image_hw: Tuple[int, int] = (512, 384),
                param_dtype: Optional[str] = None) -> EngineState:
    """Create parameters.

    ``param_dtype="bfloat16"`` stores the UNet/ControlNet/CLIP weights in
    bf16 (the VAE stays f32 — ``disable_first_stage_autocast`` parity);
    the full-size SVD stack is ~2.9B params and needs bf16 storage to fit
    a 16GB chip alongside activations. Inits are jitted (eager init is
    one device round trip per parameter — pathological on
    remote-attached TPUs) and run sequentially to bound peak memory.
    """
    unet, cnet, vae, clip = build_models(cfg)
    t = 2  # tiny time axis is enough to create every parameter
    kh, kw = latent_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jnp.zeros((t, kh, kw, 8))
    hint = jnp.zeros((t, kh * 8, kw * 8, cfg.hint_channels))
    ts = jnp.zeros((t,))
    ctx = jnp.zeros((t, 1, cfg.unet.context_dim))
    y = jnp.zeros((t, cfg.unet.adm_in_channels))
    ind = jnp.zeros((t // t, t))

    cast = None
    if param_dtype is not None and jnp.dtype(param_dtype) != jnp.float32:
        pd = jnp.dtype(param_dtype)

        def cast(tree):  # noqa: F811
            return jax.tree_util.tree_map(
                lambda a: a.astype(pd) if a.dtype == jnp.float32 else a,
                tree)

    # Jitted init matters on remote/accelerator backends (eager init is
    # one round trip per parameter); on CPU the compile costs more than
    # it saves, so init eagerly there.
    maybe_jit = (lambda f: f) if jax.default_backend() == "cpu" else jax.jit

    def run(f, k):
        p = maybe_jit(f)(k)["params"]
        if cast is not None:
            p = jax.block_until_ready(cast(p))
        return p

    unet_p = run(lambda k: unet.init(
        k, x, ts, ctx, y, num_video_frames=t,
        image_only_indicator=ind), k1)
    cnet_p = run(lambda k: cnet.init(
        k, x, hint, ts, ctx, y, num_video_frames=t,
        image_only_indicator=ind), k2)
    vae_p = maybe_jit(lambda k: vae.init(
        k, jnp.zeros((1, 64, 64, 3))))(k3)["params"]  # f32 always
    clip_p = run(lambda k: clip.init(
        k, jnp.zeros((1, 64, 64, 3))), k4)
    state = EngineState(unet=unet_p, controlnet=cnet_p, vae=vae_p,
                        clip=clip_p)
    return init_controlnet_from_unet(state)


def init_controlnet_from_unet(state: EngineState) -> EngineState:
    """Copy UNet encoder/middle weights into the ControlNet trunk
    (``init_from_unet``, csvd.py:1046-1054)."""
    trunk = dict(flax.core.unfreeze(state.controlnet)["trunk"])
    unet_p = flax.core.unfreeze(state.unet)
    for k in trunk:
        if k in unet_p:
            trunk[k] = jax.tree_util.tree_map(jnp.array, unet_p[k])
    cnet = dict(flax.core.unfreeze(state.controlnet))
    cnet["trunk"] = trunk
    return dataclasses.replace(state, controlnet=cnet)


class SVDEngine:
    """Thin functional wrapper binding configs + module defs."""

    def __init__(self, cfg: EngineConfig = EngineConfig()):
        self.cfg = cfg
        self.unet, self.controlnet, self.vae, self.clip = build_models(cfg)
        self.guider = LinearPredictionGuider(
            max_scale=cfg.cfg_max, min_scale=cfg.cfg_min,
            num_frames=cfg.num_frames,
            additional_cond_keys=("control_hint",))

    # --- first stage ---------------------------------------------------
    def encode_first_stage(self, state: EngineState, x: jnp.ndarray,
                           sample_key: Optional[jax.Array] = None
                           ) -> jnp.ndarray:
        post = self.vae.apply({"params": state.vae}, x,
                              method=AutoencoderKL.encode)
        z = post.sample(sample_key) if sample_key is not None else \
            post.mode()
        return SCALE_FACTOR * z

    def decode_first_stage(self, state: EngineState, z: jnp.ndarray,
                           timesteps: int = 1) -> jnp.ndarray:
        return self.vae.apply({"params": state.vae}, z / SCALE_FACTOR,
                              timesteps, method=AutoencoderKL.decode)

    def clip_embed(self, state: EngineState, frames: jnp.ndarray):
        return self.clip.apply({"params": state.clip}, frames)

    def conditioner(self, state: EngineState) -> Conditioner:
        from .conditioners import ConditionerConfig
        return Conditioner(
            clip_embed=lambda f: self.clip_embed(state, f),
            vae_encode_mode=lambda f: self.encode_first_stage(
                state, f) / SCALE_FACTOR,
            cfg=ConditionerConfig(
                vector_keys=tuple(self.cfg.vector_keys)),
        )

    # --- core denoising path -------------------------------------------
    def apply_model(self, state: EngineState, x: jnp.ndarray,
                    t_noise: jnp.ndarray, cond: Dict) -> jnp.ndarray:
        """x [(b t), h, w, 4] scaled latents; cond holds per-frame
        crossattn/vector/concat + control_hint (image resolution).

        ``compute_dtype="bfloat16"`` runs both networks in bf16 (norms
        stay f32 inside GroupNorm32) with an f32 output, the reference's
        16-mixed policy; ``remat=True`` rematerializes activations in the
        backward pass (use_checkpoint parity).
        """
        cfg = self.cfg
        t = cfg.num_frames
        bt = x.shape[0]
        ind = jnp.zeros((bt // t, t))
        dt = jnp.dtype(cfg.compute_dtype)

        def run(cn_params, unet_params, xc, hint, crossattn, vector):
            control = self.controlnet.apply(
                {"params": cn_params}, xc, hint, t_noise, crossattn,
                vector, num_video_frames=t, image_only_indicator=ind)
            control = [c * cfg.control_scales for c in control]
            return self.unet.apply(
                {"params": unet_params}, xc, t_noise, crossattn, vector,
                num_video_frames=t, image_only_indicator=ind,
                control=control)

        # cfg.remat acts PER BLOCK inside VideoUNet (build_models threads
        # it into UNetConfig) — a jax.checkpoint around this whole run
        # would save nothing (single chain: the backward recompute peaks
        # at the same total) while tripling compute with the nested
        # block checkpoints.
        cast = (lambda p: jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, p)) \
            if dt != jnp.float32 else (lambda p: p)
        xc = jnp.concatenate([x, cond["concat"]], axis=-1).astype(dt)
        out = run(cast(state.controlnet), cast(state.unet), xc,
                  cond["control_hint"].astype(dt),
                  cond.get("crossattn").astype(dt)
                  if cond.get("crossattn") is not None else None,
                  cond.get("vector").astype(dt)
                  if cond.get("vector") is not None else None)
        return out.astype(jnp.float32)

    def denoise_fn(self, state: EngineState):
        def net_apply_factory(cond):
            def net(x_scaled, c_noise):
                return self.apply_model(state, x_scaled, c_noise, cond)
            return net

        def denoise(x, sigmas, cond):
            return edm.denoise(net_apply_factory(cond), x, sigmas,
                               scaling=self.cfg.scaling)
        return denoise

    def inv_denoise_fn(self, state: EngineState):
        def denoise(x, sigmas, cond):
            def net(x_scaled, c_noise):
                return self.apply_model(state, x_scaled, c_noise, cond)
            return edm.raw_net_out(net, x, sigmas, scaling=self.cfg.scaling)
        return denoise

    # --- sampling --------------------------------------------------------
    def sample(self, state: EngineState, key: jax.Array, cond: Dict,
               uc: Dict, latent_shape: Tuple[int, ...],
               num_steps: Optional[int] = None,
               denoise_fn=None) -> jnp.ndarray:
        """``denoise_fn`` overrides the engine's own (e.g. the
        frame-sharded one from parallel.svd_inference_parallel)."""
        cfg = self.cfg
        sigmas = edm.edm_sigmas(num_steps or cfg.num_steps,
                                cfg.sigma_min, cfg.sigma_max)
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, latent_shape)
        dn = denoise_fn if denoise_fn is not None else self.denoise_fn(
            state)
        return samplers.euler_edm_sample(dn, x, cond, uc, sigmas,
                                         guider=self.guider, key=k2)

    def sample_blended(self, state: EngineState, key: jax.Array,
                       cond: Dict, uc: Dict, z: jnp.ndarray,
                       mask: jnp.ndarray,
                       num_steps: Optional[int] = None) -> jnp.ndarray:
        """VideoDiffusionEngine2's latent-blending sampling path."""
        cfg = self.cfg
        sigmas = edm.edm_sigmas(num_steps or cfg.num_steps,
                                cfg.sigma_min, cfg.sigma_max)
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, z.shape)
        return samplers.euler_edm_sample_blended(
            self.denoise_fn(state), x, cond, uc, sigmas, z, mask,
            guider=self.guider, key=k2)

    def sample_inversion(self, state: EngineState, key: jax.Array,
                         cond: Dict, uc: Dict, z: jnp.ndarray,
                         mask: jnp.ndarray,
                         num_steps: Optional[int] = None) -> jnp.ndarray:
        """VideoDiffusionEngine2's DDIM-inversion resampling path
        (EulerEDMSampler3 + LinearPredictionGuider2 no-op guiding)."""
        from .guiders import LinearPredictionGuider2
        cfg = self.cfg
        sigmas = edm.edm_sigmas(num_steps or cfg.num_steps,
                                cfg.sigma_min, cfg.sigma_max)
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, z.shape)
        guider2 = LinearPredictionGuider2(
            max_scale=cfg.cfg_max, min_scale=cfg.cfg_min,
            num_frames=cfg.num_frames,
            additional_cond_keys=("control_hint",))
        return samplers.euler_edm_sample_inversion(
            self.denoise_fn(state), self.inv_denoise_fn(state), x, cond,
            uc, sigmas, z, mask, guider=guider2, inv_guider=guider2,
            key=k2)

    # --- training --------------------------------------------------------
    def loss(self, state: EngineState, key: jax.Array,
             latents: jnp.ndarray, cond: Dict,
             warp: Optional[Dict] = None) -> jnp.ndarray:
        return jnp.mean(loss_mod.inpaint_diffusion_loss(
            self.denoise_fn(state), key, latents, cond,
            num_video_frames=self.cfg.num_frames, warp=warp))

    def prepare_cond(self, state: EngineState, batch: Dict,
                     key: Optional[jax.Array] = None,
                     unconditional: bool = False) -> Dict:
        """Batch (per-video) -> per-frame conditioning dict incl. the
        control hint."""
        conditioner = self.conditioner(state)
        c = conditioner(batch, force_zero=unconditional, key=key)
        t = self.cfg.num_frames
        c = repeat_cond_per_frame(c, t, keys=("crossattn", "concat",
                                              "vector"))
        c["control_hint"] = batch["control_hint"]  # already per-frame
        return c
