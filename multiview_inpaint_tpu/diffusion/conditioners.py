"""Conditioning system: embedders + the vector/crossattn/concat router.

Parity with ``sgm/modules/encoders/modules.py`` at the SVD configuration
(5 embedders, ``configs/test/svd_f_est_ctrl_simp1.yaml:66-123``):

- cond_frames_without_noise -> OpenCLIP image tokens  => ``crossattn``
  [b, 1, 1024]
- fps_id, motion_bucket_id, cond_aug -> 256-d fourier each, concatenated
  => ``vector`` [b, 768] (the UNet's adm ``y``)
- cond_frames -> VAE-encoded (mode) latents => ``concat`` [b, h/8, w/8, 4]

``get_unconditional_conditioning`` zeroes the force-zero keys (the two
cond-frame embedders) exactly like the reference; per-frame repetition of
crossattn/concat happens where consumed (engine), matching
``modules.py:166-211``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import timestep_embedding


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    embed_dim: int = 256          # fourier outdim per scalar key
    force_zero_keys: Tuple[str, ...] = ("cond_frames_without_noise",
                                        "cond_frames")
    # scalar batch keys fourier-embedded into the ``vector`` cond, in
    # order. The SVD default is (fps, motion, aug); SV3D-style pose
    # conditioning (reference my_dataset.py:351-366 +
    # configs/inference/sv3d_p.yaml:84-90) appends or swaps in
    # polars_rad / azimuths_rad / rad. Keys may be per-video [1] or
    # per-frame [t]; mixed shapes broadcast to per-frame.
    vector_keys: Tuple[str, ...] = ("fps_id", "motion_bucket_id",
                                    "cond_aug")


def fourier_scalar_embed(value: jnp.ndarray, outdim: int) -> jnp.ndarray:
    """ConcatTimestepEmbedderND: [b] or [b, d] scalars -> [b, d*outdim]."""
    v = value.reshape(-1)
    emb = timestep_embedding(v, outdim)
    return emb.reshape(value.shape[0], -1)


class Conditioner:
    """Functional conditioner closing over the frozen encoder applies.

    ``clip_embed(frames [b,H,W,3]) -> [b, D]`` and
    ``vae_encode_mode(frames [b,H,W,3]) -> [b, h, w, 4]`` are injected so
    this module stays agnostic of parameter plumbing.
    """

    def __init__(self, clip_embed, vae_encode_mode,
                 cfg: ConditionerConfig = ConditionerConfig()):
        self.clip_embed = clip_embed
        self.vae_encode_mode = vae_encode_mode
        self.cfg = cfg

    def __call__(self, batch: Dict,
                 force_zero: bool = False,
                 key: Optional[jax.Array] = None) -> Dict:
        """batch keys: cond_frames_without_noise [b,H,W,3],
        cond_frames [b,H,W,3], fps_id [b], motion_bucket_id [b],
        cond_aug [b]. Returns {vector, crossattn, concat}.
        """
        # crossattn: CLIP tokens of the (clean) conditioning frame.
        tokens = self.clip_embed(batch["cond_frames_without_noise"])
        crossattn = tokens[:, None, :]

        # vector: fourier embeds of the configured scalar keys; [1]- and
        # [t]-shaped keys may mix (per-frame wins, per-video broadcasts).
        embs = [fourier_scalar_embed(batch[k].reshape(-1, 1),
                                     self.cfg.embed_dim)
                for k in self.cfg.vector_keys]
        rows = max(e.shape[0] for e in embs)
        embs = [jnp.broadcast_to(e, (rows, e.shape[1])) for e in embs]
        vec = jnp.concatenate(embs, axis=-1)

        # concat: VAE latents of the noise-augmented conditioning frame.
        frames = batch["cond_frames"]
        if key is not None:
            aug = batch["cond_aug"].reshape(
                (-1,) + (1,) * (frames.ndim - 1))
            frames = frames + aug * jax.random.normal(key, frames.shape,
                                                      frames.dtype)
        concat = self.vae_encode_mode(frames)

        if force_zero:
            crossattn = jnp.zeros_like(crossattn)
            concat = jnp.zeros_like(concat)
        return {"vector": vec, "crossattn": crossattn, "concat": concat}

    def paired(self, batch: Dict, key: Optional[jax.Array] = None
               ) -> Tuple[Dict, Dict]:
        """(conditional, unconditional) like
        ``get_unconditional_conditioning``."""
        c = self(batch, force_zero=False, key=key)
        uc = self(batch, force_zero=True, key=key)
        return c, uc


def repeat_cond_per_frame(cond: Dict, t: int,
                          keys=("crossattn", "concat")) -> Dict:
    """[b, ...] -> [(b t), ...] for the fold-time-into-batch layout.

    Leaves already-per-frame leaves (leading dim == t) alone — the
    vector cond arrives per-frame when per-frame scalar keys (pose
    conditioning) are configured."""
    out = dict(cond)
    for k in keys:
        if k in out:
            v = out[k]
            if v.shape[0] != t:
                out[k] = jnp.repeat(v, t, axis=0)
    return out
