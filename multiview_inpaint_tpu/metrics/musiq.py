"""MUSIQ — Multi-scale Image Quality Transformer (flax, TPU-native).

The reference scores inpainted renders with ``pyiqa.create_metric('musiq')``
(``/root/reference/metrics/metrics.py:101-112``; consumed by
``metrics/cmp.py:23,49``). This is a from-scratch flax implementation of
the MUSIQ architecture (Ke et al., ICCV 2021):

- multi-scale input: the native-resolution image plus aspect-ratio-
  preserving resizes whose longer side is 384 and 224;
- each scale padded to a multiple of 32 and cut into 32x32 patches, all
  scales sharing ONE linear patch projection to ``dim``;
- hash-based 2D spatial embedding: each patch adds the entry of a
  ``grid x grid`` learned table indexed by its *normalized* grid cell,
  so one table serves every resolution;
- a learned per-scale embedding added to every token of that scale;
- CLS token + pre-LN ViT encoder (14 layers, 384 wide, 6 heads,
  MLP 1152) + final LN + linear head -> one quality score.

TPU notes: token counts depend only on the (static) input H, W, so each
image size jit-specializes to a fixed-shape graph — no masking, no
dynamic shapes. Weights come from ``load_params`` npz checkpoints
(convert externally-trained MUSIQ weights with ``import_musiq``; the
mapping table is explicit because the torch port's key space is not
standardized).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MUSIQConfig:
    patch: int = 32
    dim: int = 384
    layers: int = 14
    heads: int = 6
    mlp_dim: int = 1152
    grid: int = 10                 # hash-embedding grid (per axis)
    scales: Tuple[int, ...] = (384, 224)   # longer-side ARP resizes


TINY_MUSIQ = MUSIQConfig(patch=32, dim=32, layers=2, heads=2, mlp_dim=64,
                         grid=4, scales=(64,))


class _Block(nn.Module):
    cfg: MUSIQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.heads, qkv_features=cfg.dim, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(cfg.mlp_dim, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.dim, name="mlp_1")(h)
        return x + h


def _arp_size(h: int, w: int, longer: int) -> Tuple[int, int]:
    """Aspect-ratio-preserving size with the longer side == ``longer``."""
    if h >= w:
        return longer, max(1, round(w * longer / h))
    return max(1, round(h * longer / w)), longer


def _grid_index(gh: int, gw: int, grid: int) -> np.ndarray:
    """[gh*gw] flat indices into the grid x grid hash table."""
    i = np.minimum((np.arange(gh) * grid) // max(gh, 1), grid - 1)
    j = np.minimum((np.arange(gw) * grid) // max(gw, 1), grid - 1)
    return (i[:, None] * grid + j[None, :]).reshape(-1)


class MUSIQ(nn.Module):
    cfg: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img [B, H, W, 3] in [0, 1] -> scores [B]."""
        cfg = self.cfg
        b, h, w, _ = img.shape
        p = cfg.patch

        proj = nn.Dense(cfg.dim, name="patch_proj")
        hse = self.param("spatial_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.grid * cfg.grid, cfg.dim))
        sce = self.param("scale_embedding",
                         nn.initializers.normal(0.02),
                         (len(cfg.scales) + 1, cfg.dim))

        def tokenize(x, scale_idx):
            sh, sw = x.shape[1], x.shape[2]
            ph = -sh % p
            pw = -sw % p
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            gh, gw = (sh + ph) // p, (sw + pw) // p
            x = x.reshape(b, gh, p, gw, p, 3)
            x = jnp.moveaxis(x, 2, 3).reshape(b, gh * gw, p * p * 3)
            tok = proj(x)
            tok = tok + hse[jnp.asarray(_grid_index(gh, gw, cfg.grid))]
            return tok + sce[scale_idx]

        tokens = [tokenize(img, 0)]
        for s, longer in enumerate(cfg.scales):
            th, tw = _arp_size(h, w, longer)
            x = jax.image.resize(img, (b, th, tw, 3), "bilinear")
            tokens.append(tokenize(x, s + 1))

        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, cfg.dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1))] + tokens, axis=1)
        for i in range(cfg.layers):
            x = _Block(cfg, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_final")(x[:, 0])
        return nn.Dense(1, name="head")(x)[:, 0]


class MUSIQScorer:
    """Callable wrapper matching the reference's ``MUSIQ`` metric class
    (``metrics/metrics.py:101-112``): numpy [H, W, 3] in [0,1] -> float.
    Jit-caches per image shape."""

    def __init__(self, params: Dict, cfg: MUSIQConfig = MUSIQConfig()):
        self.model = MUSIQ(cfg)
        self.params = params
        self._fns = {}

    def __call__(self, img: np.ndarray) -> float:
        key = img.shape
        if key not in self._fns:
            self._fns[key] = jax.jit(
                lambda p, x: self.model.apply({"params": p}, x))
        out = self._fns[key](self.params,
                             jnp.asarray(img, jnp.float32)[None])
        return float(out[0])


# Default torch-key mapping (one common torch port's naming); the key
# space of torch MUSIQ ports is not standardized, so import_musiq takes
# an override table.
_TORCH_MAP = {
    "patch_proj": "embedding.patch_projection",
    "spatial_embedding": "embedding.spatial_embedding",
    "scale_embedding": "embedding.scale_embedding",
    "cls": "cls_token",
    "ln_final": "norm",
    "head": "head",
}


def import_musiq(flax_params: Dict, state_dict: Dict[str, np.ndarray],
                 heads: int = 6, key_map: Dict[str, str] | None = None):
    """Torch MUSIQ state dict -> flax params (tolerant merge).

    Transformer blocks follow the same packed-QKV convention as CLIP
    towers and reuse that mapping; top-level names go through
    ``key_map`` (defaults above, override per checkpoint)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    from ..diffusion.weights_io import _map_clip_tower, _merge_exact
    km = dict(_TORCH_MAP)
    km.update(key_map or {})
    inv = {v: k for k, v in km.items()}
    mapped = {}
    blocks = {}
    for k, v in state_dict.items():
        parts = k.split(".")
        if parts[0] in ("transformer", "blocks", "encoder"):
            blocks[k] = v
            continue
        stem = ".".join(parts[:-1])
        leaf = parts[-1]
        if stem in inv:
            name = inv[stem]
            if name in ("ln_final",):
                mapped[(name, "scale" if leaf == "weight" else "bias")] = v
            elif leaf == "weight":
                mapped[(name, "kernel")] = v.T
            elif leaf == "bias":
                mapped[(name, "bias")] = v
        elif k in inv:
            mapped[(inv[k],)] = np.asarray(v)
    # blocks: rename to the CLIP-tower resblock convention then reuse it.
    renamed = {}
    for k, v in blocks.items():
        parts = k.split(".")
        i = parts[1] if parts[1].isdigit() else parts[2]
        rest = parts[2 if parts[1].isdigit() else 3:]
        sub = ".".join(rest)
        sub = (sub.replace("norm1", "ln_1").replace("norm2", "ln_2")
               .replace("mlp.fc1", "mlp.c_fc").replace("mlp.fc2",
                                                       "mlp.c_proj"))
        renamed[f"transformer.resblocks.{i}.{sub}"] = v
    clip_mapped = _map_clip_tower(renamed, heads)
    for k, v in clip_mapped.items():
        name = k[0].replace("resblocks_", "block_")
        rest = list(k[1:])
        if rest[:1] == ["mlp_c_fc"]:
            rest[0] = "mlp_0"
        elif rest[:1] == ["mlp_c_proj"]:
            rest[0] = "mlp_1"
        mapped[(name, *rest)] = v
    # cls: torch [1,1,D] matches flax [1,1,D]
    return _merge_exact(flax_params, mapped)
