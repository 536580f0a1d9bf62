"""Torch-checkpoint import: SVD safetensors / ControlNet ckpts -> flax.

The reference loads ``checkpoints/svd.safetensors`` (torch key space,
``sgm/models/diffusion.py:93-128``) and ControlNet checkpoints prefixed
``control_model.`` (``models/csvd.py:500-550``). This module maps those
key spaces onto our flax trees:

- layout transposes: Conv2d (O,I,H,W)->(H,W,I,O); Conv3d
  (O,I,T,H,W)->(T,H,W,I,O); Linear (O,I)->(I,O); norm weight->scale.
- structural renames: dotted torch module paths -> our underscore names,
  VideoResBlock spatial params under ``spatial/``, the SpatialTransformer
  norm under ``<block>/norm/norm`` (GroupNorm32 wrapper), VAE
  ``down.N.block.M`` -> ``down_N_block_M`` etc.

Entry points:
  load_torch_state_dict(path)           safetensors/ckpt -> {key: np}
  import_unet / import_vae / import_controlnet(flax_params, state_dict)
Each returns (params, missing, unexpected) with tolerant merging, same
spirit as the reference's ``init_from_test``.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            return load_file(path)
        except ImportError:
            from safetensors import safe_open
            out = {}
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _to_flax_leaf(torch_key: str, arr: np.ndarray,
                  flax_shape) -> np.ndarray:
    """Apply the layout transpose implied by shapes."""
    if arr.ndim == 4 and len(flax_shape) == 4:      # Conv2d
        return arr.transpose(2, 3, 1, 0)
    if arr.ndim == 5 and len(flax_shape) == 5:      # Conv3d
        return arr.transpose(2, 3, 4, 1, 0)
    if arr.ndim == 2 and len(flax_shape) == 2:      # Linear
        return arr.T
    return arr


_UNET_RULES = [
    # module path dots -> underscores for the block containers
    (re.compile(r"^(input_blocks|output_blocks)\.(\d+)\.(\d+)\."),
     r"\1_\2_\3."),
    (re.compile(r"^middle_block\.(\d+)\."), r"middle_block_\1."),
    (re.compile(r"^time_embed\.(\d+)\."), r"time_embed_\1."),
    (re.compile(r"^label_emb\.(\d+)\.(\d+)\."), r"label_emb_\1_\2."),
    (re.compile(r"^out\.(\d+)\."), r"out_\1."),
]


def _map_unet_key(key: str, video: bool = True) -> List[str]:
    """torch UNet key (no prefix) -> flax path components, or [] to skip.

    ``video=False`` maps the plain 2D UNet (SD-2-inpainting): ResBlock
    params sit at the block level instead of under ``spatial/``."""
    for pat, repl in _UNET_RULES:
        key = pat.sub(repl, key)
    parts = key.split(".")
    name, leaf = parts[:-1], parts[-1]

    out: List[str] = []
    i = 0
    while i < len(name):
        tok = name[i]
        if tok in ("in_layers", "emb_layers", "out_layers"):
            idx = name[i + 1]
            # VideoResBlock spatial params live under "spatial" unless we
            # are inside a time_stack (the 3D resblock keeps them flat).
            if video and "time_stack" not in out and \
                    not _in_transformer(out):
                if not out or out[-1] != "spatial":
                    out.append("spatial")
            out.append(f"{tok}_{idx}")
            if tok != "emb_layers" and leaf in ("weight", "bias") and \
                    idx == "0":
                out.append("norm")  # GroupNorm32 wrapper
            i += 2
            continue
        if tok == "skip_connection":
            if video and "time_stack" not in out:
                out.append("spatial")
            out.append(tok)
            i += 1
            continue
        if tok == "norm" and not _in_transformer(out) and \
                len(name) == i + 1:
            # SpatialTransformer GroupNorm32 wrapper
            out += ["norm", "norm"]
            i += 1
            continue
        if tok == "out_0" and len(name) == i + 1:
            # Final output GroupNorm32 ("out.0")
            out += ["out_0", "norm"]
            i += 1
            continue
        if tok in ("transformer_blocks", "time_stack") and i + 1 < len(
                name) and name[i + 1].isdigit():
            out.append(f"{tok}_{name[i + 1]}")
            i += 2
            continue
        if tok == "ff" or tok == "ff_in":
            nxt = name[i + 1:]
            # ff.net.0.proj -> ff/net_0_proj ; ff.net.2 -> ff/net_2
            if nxt[:2] == ["net", "0"]:
                out += [tok, "net_0_proj"]
                i += 4
            else:
                out += [tok, "net_2"]
                i += 3
            continue
        if tok == "to_out":
            out.append("to_out_0")
            i += 2
            continue
        if tok == "time_pos_embed":
            out.append(f"time_pos_embed_{name[i + 1]}")
            i += 2
            continue
        out.append(tok)
        i += 1

    if leaf == "weight":
        if out and ("norm" in out[-1] or out[-1] == "norm"):
            leaf = "scale"
        else:
            leaf = "kernel"
    if leaf == "mix_factor":
        out.append("mix_factor")
        return out
    out.append({"weight": "kernel", "bias": "bias",
                "scale": "scale", "kernel": "kernel"}.get(leaf, leaf))
    return out


def _in_transformer(out: List[str]) -> bool:
    return any(p.startswith("transformer_blocks") or
               p.startswith("time_stack_") or p == "time_stack"
               for p in out)


_VAE_RULES = [
    (re.compile(r"down\.(\d+)\.block\.(\d+)\."), r"down_\1_block_\2."),
    (re.compile(r"down\.(\d+)\.downsample\.conv\."),
     r"down_\1_downsample_conv."),
    (re.compile(r"up\.(\d+)\.block\.(\d+)\."), r"up_\1_block_\2."),
    (re.compile(r"up\.(\d+)\.upsample\.conv\."), r"up_\1_upsample_conv."),
    (re.compile(r"mid\.block_(\d+)\."), r"mid_block_\1."),
    (re.compile(r"mid\.attn_1\."), r"mid_attn_1."),
    (re.compile(r"conv_out\.time_mix_conv\."), r"conv_out_time_mix."),
]

_VAE_TIME_STACK = [
    ("time_stack.in_layers.0", "time_stack_in_norm"),
    ("time_stack.in_layers.2", "time_stack_in_conv"),
    ("time_stack.out_layers.0", "time_stack_out_norm"),
    ("time_stack.out_layers.3", "time_stack_out_conv"),
    ("time_stack.skip_connection", "time_stack_skip"),
]


def _map_vae_key(key: str, video_decoder: bool) -> List[str]:
    for pat, repl in _VAE_RULES:
        key = pat.sub(repl, key)
    for old, new in _VAE_TIME_STACK:
        key = key.replace(old, new)
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]
    # Video decoder: spatial resnet params nest under "spatial".
    if video_decoder and body and body[0] == "decoder":
        blockish = len(body) > 1 and (
            body[1].startswith("mid_block") or "_block_" in body[1])
        spatial_leafs = ("norm1", "conv1", "norm2", "conv2", "nin_shortcut")
        if blockish and len(body) > 2 and body[2] in spatial_leafs:
            body = body[:2] + ["spatial"] + body[2:]
    is_norm = body and ("norm" in body[-1])
    if leaf == "weight":
        leaf = "scale" if is_norm else "kernel"
    if leaf == "mix_factor":
        return body + ["mix_factor"]
    return body + [leaf]


def _merge(flax_params: Dict, mapped: Dict[Tuple[str, ...], np.ndarray]):
    flat = dict(flatten_dict(flax_params))
    missing, unexpected = [], []
    for k, v in mapped.items():
        if k in flat:
            v = _to_flax_leaf("/".join(k), v, flat[k].shape)
            if tuple(v.shape) == tuple(flat[k].shape):
                flat[k] = jnp.asarray(v)
            else:
                unexpected.append("/".join(k) +
                                  f" shape {v.shape} vs {flat[k].shape}")
        else:
            unexpected.append("/".join(k))
    loaded_keys = set(mapped.keys())
    missing = ["/".join(k) for k in flat if k not in loaded_keys]
    return unflatten_dict(flat), missing, unexpected


def import_unet(flax_params: Dict, state_dict: Dict[str, np.ndarray],
                prefix: str = "model.diffusion_model.",
                video: bool = True):
    mapped = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        path = _map_unet_key(k[len(prefix):], video=video)
        if path:
            mapped[tuple(path)] = v
    return _merge(flax_params, mapped)


def import_controlnet(flax_params: Dict,
                      state_dict: Dict[str, np.ndarray],
                      prefix: str = "control_model."):
    """ControlNet checkpoint: trunk (UNet-encoder clone) + hint block +
    zero convs. Our trunk lives under ``trunk/``."""
    mapped = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        key = k[len(prefix):]
        if key.startswith("input_hint_block."):
            idx = key.split(".")[1]
            leaf = key.split(".")[-1]
            mapped[(f"input_hint_block_{idx}",
                    "kernel" if leaf == "weight" else leaf)] = v
        elif key.startswith("zero_convs."):
            idx = key.split(".")[1]
            leaf = key.split(".")[-1]
            mapped[(f"zero_convs_{idx}_0",
                    "kernel" if leaf == "weight" else leaf)] = v
        elif key.startswith("middle_block_out."):
            leaf = key.split(".")[-1]
            mapped[("middle_block_out_0",
                    "kernel" if leaf == "weight" else leaf)] = v
        else:
            path = _map_unet_key(key)
            if path:
                mapped[tuple(["trunk"] + path)] = v
    return _merge(flax_params, mapped)


def import_vae(flax_params: Dict, state_dict: Dict[str, np.ndarray],
               prefix: str = "first_stage_model.",
               video_decoder: bool = True):
    mapped = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        path = _map_vae_key(k[len(prefix):], video_decoder)
        if path:
            mapped[tuple(path)] = v
    return _merge(flax_params, mapped)


# ---------------------------------------------------------------------------
# OpenCLIP towers (vision inside the SVD ckpt, text from an OpenCLIP ckpt).
# torch ``nn.MultiheadAttention`` packs QKV into ``in_proj_weight`` [3W, W]
# applied as x @ W.T; flax splits per head:
# query/key/value kernel [W, H, W/H], out kernel [H, W/H, W]. These leaves
# are emitted already in flax layout, so the merge is exact (no generic
# transpose pass).

def _map_clip_tower(sd: Dict[str, np.ndarray],
                    heads: int) -> Dict[Tuple[str, ...], np.ndarray]:
    """OpenCLIP tower state dict (tower prefix stripped) -> flax leaves."""
    mapped: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[:2] == ["transformer", "resblocks"]:
            block = f"resblocks_{parts[2]}"
            rest, leaf = parts[3:-1], parts[-1]
            if rest and rest[0] == "attn":
                w = v.shape[-1]
                hd = w // heads
                if leaf == "in_proj_weight":
                    for name, chunk in zip(
                            ("query", "key", "value"),
                            np.split(v, 3, axis=0)):
                        mapped[(block, "attn", name, "kernel")] = \
                            chunk.T.reshape(w, heads, hd)
                elif leaf == "in_proj_bias":
                    w3 = v.shape[0] // 3
                    for name, chunk in zip(
                            ("query", "key", "value"),
                            np.split(v, 3, axis=0)):
                        mapped[(block, "attn", name, "bias")] = \
                            chunk.reshape(heads, w3 // heads)
                elif rest[1:] == ["out_proj"] and leaf == "weight":
                    mapped[(block, "attn", "out", "kernel")] = \
                        v.T.reshape(heads, hd, w)
                elif rest[1:] == ["out_proj"] and leaf == "bias":
                    mapped[(block, "attn", "out", "bias")] = v
                continue
            if rest and rest[0] in ("ln_1", "ln_2"):
                mapped[(block, rest[0],
                        "scale" if leaf == "weight" else "bias")] = v
            elif rest[:2] in (["mlp", "c_fc"], ["mlp", "c_proj"]):
                mapped[(block, f"mlp_{rest[1]}",
                        "kernel" if leaf == "weight" else "bias")] = \
                    (v.T if leaf == "weight" else v)
            continue
        if k in ("class_embedding", "positional_embedding", "proj",
                 "text_projection"):
            mapped[(k,)] = v
        elif k == "token_embedding.weight":
            mapped[("token_embedding", "embedding")] = v
        elif k == "conv1.weight":
            mapped[("conv1", "kernel")] = v.transpose(2, 3, 1, 0)
        elif parts[0] in ("ln_pre", "ln_post", "ln_final"):
            mapped[(parts[0],
                    "scale" if parts[-1] == "weight" else "bias")] = v
        # logit_scale / attn_mask buffers are intentionally dropped.
    return mapped


def _merge_exact(flax_params: Dict,
                 mapped: Dict[Tuple[str, ...], np.ndarray]):
    flat = dict(flatten_dict(flax_params))
    unexpected = []
    for k, v in mapped.items():
        if k in flat and tuple(v.shape) == tuple(flat[k].shape):
            flat[k] = jnp.asarray(v)
        else:
            unexpected.append("/".join(k) + (
                f" shape {v.shape} vs {flat[k].shape}" if k in flat
                else ""))
    missing = ["/".join(k) for k in flat if k not in mapped]
    return unflatten_dict(flat), missing, unexpected


def import_clip_vision(
        flax_params: Dict, state_dict: Dict[str, np.ndarray],
        prefix: str = "conditioner.embedders.0.open_clip.model.visual.",
        heads: int = 16):
    """OpenCLIP ViT visual tower -> :class:`clip_vit.CLIPVisionTower`.

    Default prefix matches the SVD checkpoint's image-conditioner key
    space (reference ``sgm/modules/encoders/modules.py:597-667``); pass
    ``prefix="visual."`` for a standalone OpenCLIP checkpoint."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    return _merge_exact(flax_params, _map_clip_tower(sub, heads))


def import_svd(params: Dict[str, Dict], state_dict: Dict[str, np.ndarray],
               clip_heads: int = 16):
    """One-call import of a full SVD torch checkpoint.

    ``params`` is ``{"unet": ..., "vae": ..., "clip": ...}`` (any subset);
    returns ``(updated_params, report)`` where report maps each present
    key to ``(n_missing, n_unexpected)``. The checkpoint carries the UNet
    under ``model.diffusion_model.``, the KL-VAE under
    ``first_stage_model.`` and the OpenCLIP-H visual tower under the
    image conditioner (reference ``sgm/models/diffusion.py:93-128``)."""
    out, report = dict(params), {}
    if "unet" in params:
        out["unet"], m, u = import_unet(params["unet"], state_dict)
        report["unet"] = (len(m), len(u))
    if "vae" in params:
        out["vae"], m, u = import_vae(params["vae"], state_dict)
        report["vae"] = (len(m), len(u))
    if "clip" in params:
        out["clip"], m, u = import_clip_vision(params["clip"], state_dict,
                                               heads=clip_heads)
        report["clip"] = (len(m), len(u))
    return out, report


def import_clip_text(flax_params: Dict,
                     state_dict: Dict[str, np.ndarray],
                     prefix: str = "", heads: int = 16):
    """OpenCLIP text tower -> :class:`clip_text.CLIPTextTower`.

    In a standalone OpenCLIP checkpoint text keys sit at the root next to
    ``visual.*`` (which is skipped); pass a prefix for wrapped ckpts."""
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)
           and not k[len(prefix):].startswith("visual.")}
    return _merge_exact(flax_params, _map_clip_tower(sub, heads))
