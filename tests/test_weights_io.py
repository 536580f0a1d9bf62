"""Weight-import round trip: flax tree -> synthetic torch state dict ->
import_unet/import_vae/import_controlnet -> exact tree equality.

The test builds the torch-side key for every flax leaf with an inverse of
the documented mapping rules; if forward and inverse disagree anywhere the
import reports missing/unexpected keys and the test fails — i.e. this
checks *total* coverage of the mapping on the tiny configs (same
structure as the real SVD models, smaller dims).
"""

import re

import numpy as np
import jax
import pytest
from flax.traverse_util import flatten_dict

from multiview_inpaint_tpu.diffusion import weights_io
from multiview_inpaint_tpu.diffusion.controlnet import ControlNet
from multiview_inpaint_tpu.diffusion.unet import UNetConfig, VideoUNet
from multiview_inpaint_tpu.diffusion.vae import AutoencoderKL, VAEConfig

import jax.numpy as jnp

TINY_UNET = UNetConfig(model_channels=32, num_res_blocks=1,
                       attention_resolutions=(1,), channel_mult=(1, 2),
                       num_head_channels=16, context_dim=16,
                       adm_in_channels=24)
TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)

_CONTAINERS = ("input_blocks", "output_blocks", "middle_block",
               "time_embed", "label_emb", "out", "zero_convs")


def _unet_path_to_torch(path):
    """Inverse of weights_io._map_unet_key for test synthesis."""
    parts = list(path)
    leaf = parts.pop()
    toks = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "spatial":
            i += 1
            continue
        if p == "norm" and i + 1 < len(parts) and parts[i + 1] == "norm":
            toks.append("norm")
            i += 2
            continue
        if p == "out_0" and i + 1 < len(parts) and parts[i + 1] == "norm":
            toks.append("out.0")
            i += 2
            continue
        if p.startswith("in_layers_") or p.startswith("out_layers_") or \
                p.startswith("emb_layers_"):
            base, idx = p.rsplit("_", 1)
            toks.append(f"{base}.{idx}")
            # skip GroupNorm32 "norm" wrapper
            if i + 1 < len(parts) and parts[i + 1] == "norm":
                i += 1
            i += 1
            continue
        if any(re.fullmatch(c + r"(_\d+)+", p) for c in _CONTAINERS):
            for c in _CONTAINERS:
                if re.fullmatch(c + r"(_\d+)+", p):
                    toks.append(c + "." + p[len(c) + 1:].replace("_", "."))
                    break
            i += 1
            continue
        if p.startswith("transformer_blocks_") or \
                (p.startswith("time_stack_") and p[11:].isdigit()):
            base, idx = p.rsplit("_", 1)
            toks.append(f"{base}.{idx}")
            i += 1
            continue
        if p == "net_0_proj":
            toks.append("net.0.proj")
            i += 1
            continue
        if p == "net_2":
            toks.append("net.2")
            i += 1
            continue
        if p == "to_out_0":
            toks.append("to_out.0")
            i += 1
            continue
        if p.startswith("time_pos_embed_"):
            toks.append("time_pos_embed." + p.rsplit("_", 1)[1])
            i += 1
            continue
        toks.append(p)
        i += 1
    leaf_t = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mix_factor": "mix_factor"}[leaf]
    return ".".join(toks + [leaf_t])


def _to_torch_layout(arr):
    a = np.asarray(arr)
    if a.ndim == 4:
        return a.transpose(3, 2, 0, 1)
    if a.ndim == 5:
        return a.transpose(4, 3, 0, 1, 2)
    if a.ndim == 2:
        return a.T
    return a


def test_unet_import_total_coverage():
    unet = VideoUNet(TINY_UNET)
    t = 2
    params = unet.init(jax.random.key(0), jnp.zeros((t, 8, 8, 8)),
                       jnp.zeros((t,)), jnp.zeros((t, 1, 16)),
                       jnp.zeros((t, 24)), num_video_frames=t,
                       image_only_indicator=jnp.zeros((1, t)))["params"]
    rng = np.random.default_rng(0)
    sd = {}
    for path, leaf in flatten_dict(params).items():
        tk = "model.diffusion_model." + _unet_path_to_torch(path)
        sd[tk] = _to_torch_layout(
            rng.normal(size=np.asarray(leaf).shape).astype(np.float32))
    merged, missing, unexpected = weights_io.import_unet(params, sd)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]
    # spot check a conv kernel value actually landed (transposed back)
    k = ("input_blocks_0_0", "kernel")
    got = np.asarray(flatten_dict(merged)[k])
    want = sd["model.diffusion_model.input_blocks.0.0.weight"].transpose(
        2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_controlnet_import_total_coverage():
    cnet = ControlNet(TINY_UNET, hint_channels=7)
    t = 2
    params = cnet.init(jax.random.key(0), jnp.zeros((t, 8, 8, 8)),
                       jnp.zeros((t, 64, 64, 7)), jnp.zeros((t,)),
                       jnp.zeros((t, 1, 16)), jnp.zeros((t, 24)),
                       num_video_frames=t,
                       image_only_indicator=jnp.zeros((1, t)))["params"]
    rng = np.random.default_rng(1)
    sd = {}
    for path, leaf in flatten_dict(params).items():
        parts = list(path)
        if parts[0] == "trunk":
            tk = _unet_path_to_torch(parts[1:])
        elif parts[0].startswith("input_hint_block_"):
            idx = parts[0].rsplit("_", 1)[1]
            tk = f"input_hint_block.{idx}." + \
                 {"kernel": "weight", "bias": "bias"}[parts[1]]
        elif parts[0].startswith("zero_convs_"):
            idx = parts[0].split("_")[2]
            tk = f"zero_convs.{idx}.0." + \
                 {"kernel": "weight", "bias": "bias"}[parts[1]]
        else:  # middle_block_out_0
            tk = "middle_block_out.0." + \
                 {"kernel": "weight", "bias": "bias"}[parts[1]]
        sd["control_model." + tk] = _to_torch_layout(
            rng.normal(size=np.asarray(leaf).shape).astype(np.float32))
    merged, missing, unexpected = weights_io.import_controlnet(params, sd)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]


def _vae_path_to_torch(path):
    parts = list(path)
    leaf = parts.pop()
    toks = []
    for p in parts:
        if p == "spatial":
            continue
        if p.startswith("down_") and "_block_" in p:
            l, i = p.replace("down_", "").split("_block_")
            toks.append(f"down.{l}.block.{i}")
        elif p.startswith("up_") and "_block_" in p:
            l, i = p.replace("up_", "").split("_block_")
            toks.append(f"up.{l}.block.{i}")
        elif p.startswith("down_") and p.endswith("_downsample_conv"):
            toks.append(f"down.{p.split('_')[1]}.downsample.conv")
        elif p.startswith("up_") and p.endswith("_upsample_conv"):
            toks.append(f"up.{p.split('_')[1]}.upsample.conv")
        elif p.startswith("mid_block_"):
            toks.append("mid.block_" + p.rsplit("_", 1)[1])
        elif p == "mid_attn_1":
            toks.append("mid.attn_1")
        elif p == "conv_out_time_mix":
            toks.append("conv_out.time_mix_conv")
        elif p == "time_stack_in_norm":
            toks.append("time_stack.in_layers.0")
        elif p == "time_stack_in_conv":
            toks.append("time_stack.in_layers.2")
        elif p == "time_stack_out_norm":
            toks.append("time_stack.out_layers.0")
        elif p == "time_stack_out_conv":
            toks.append("time_stack.out_layers.3")
        else:
            toks.append(p)
    leaf_t = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mix_factor": "mix_factor"}[leaf]
    return ".".join(toks + [leaf_t])


def test_vae_import_total_coverage():
    vae = AutoencoderKL(TINY_VAE, video_decoder=True)
    params = vae.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                      2)["params"]
    rng = np.random.default_rng(2)
    sd = {}
    for path, leaf in flatten_dict(params).items():
        tk = "first_stage_model." + _vae_path_to_torch(path)
        sd[tk] = _to_torch_layout(
            rng.normal(size=np.asarray(leaf).shape).astype(np.float32))
    merged, missing, unexpected = weights_io.import_vae(params, sd)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]


# ---------------------------------------------------------------------------
# OpenCLIP towers


def _clip_tower_sd(params, rng):
    """Inverse of weights_io._map_clip_tower: flax tree -> torch-style
    state dict with random values (packed QKV, OIHW conv, W.T linears)."""
    flat = flatten_dict(params)
    sd = {}
    done_attn = set()
    for path in flat:
        p0 = path[0]
        if p0.startswith("resblocks_"):
            i = p0.split("_")[1]
            pre = f"transformer.resblocks.{i}"
            if path[1] == "attn":
                if pre in done_attn:
                    continue
                done_attn.add(pre)
                w = np.asarray(flat[path[:2] + ("out", "bias")]).shape[0]
                sd[f"{pre}.attn.in_proj_weight"] = rng.normal(
                    size=(3 * w, w)).astype(np.float32)
                sd[f"{pre}.attn.in_proj_bias"] = rng.normal(
                    size=(3 * w,)).astype(np.float32)
                sd[f"{pre}.attn.out_proj.weight"] = rng.normal(
                    size=(w, w)).astype(np.float32)
                sd[f"{pre}.attn.out_proj.bias"] = rng.normal(
                    size=(w,)).astype(np.float32)
                continue
            shape = np.asarray(flat[path]).shape
            if path[1] in ("ln_1", "ln_2"):
                leaf = "weight" if path[2] == "scale" else "bias"
                sd[f"{pre}.{path[1]}.{leaf}"] = rng.normal(
                    size=shape).astype(np.float32)
            else:  # mlp_c_fc / mlp_c_proj
                sub = path[1].replace("mlp_", "mlp.").replace(
                    "c_", "c_")
                leaf = "weight" if path[2] == "kernel" else "bias"
                if leaf == "weight":
                    shape = shape[::-1]
                sd[f"{pre}.{sub}.{leaf}"] = rng.normal(
                    size=shape).astype(np.float32)
            continue
        shape = np.asarray(flat[path]).shape
        if path == ("conv1", "kernel"):
            h, ww, ic, oc = shape
            sd["conv1.weight"] = rng.normal(
                size=(oc, ic, h, ww)).astype(np.float32)
        elif path == ("token_embedding", "embedding"):
            sd["token_embedding.weight"] = rng.normal(
                size=shape).astype(np.float32)
        elif p0 in ("ln_pre", "ln_post", "ln_final"):
            leaf = "weight" if path[1] == "scale" else "bias"
            sd[f"{p0}.{leaf}"] = rng.normal(size=shape).astype(np.float32)
        else:  # class_embedding / positional_embedding / proj / text_proj
            sd[p0] = rng.normal(size=shape).astype(np.float32)
    return sd


def test_clip_vision_import_total_coverage():
    from multiview_inpaint_tpu.diffusion.clip_vit import (CLIPVisionTower,
                                                          TINY_VIT)
    tower = CLIPVisionTower(TINY_VIT)
    params = tower.init(jax.random.key(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    rng = np.random.default_rng(3)
    pfx = "conditioner.embedders.0.open_clip.model.visual."
    sd = {pfx + k: v for k, v in _clip_tower_sd(params, rng).items()}
    merged, missing, unexpected = weights_io.import_clip_vision(
        params, sd, heads=TINY_VIT.heads)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]
    # imported params actually change the forward output
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    a = tower.apply({"params": params}, x)
    b = tower.apply({"params": merged}, x)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_clip_text_import_total_coverage():
    from multiview_inpaint_tpu.diffusion.clip_text import (CLIPTextTower,
                                                           TextConfig)
    cfg = TextConfig(vocab_size=64, context_length=8, width=16, layers=2,
                     heads=2, output_dim=12)
    tower = CLIPTextTower(cfg)
    params = tower.init(jax.random.key(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    rng = np.random.default_rng(4)
    sd = _clip_tower_sd(params, rng)
    sd["logit_scale"] = np.float32(4.6)          # skipped buffers
    sd["visual.proj"] = rng.normal(size=(3, 3)).astype(np.float32)
    merged, missing, unexpected = weights_io.import_clip_text(
        params, sd, heads=cfg.heads)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]
    toks = jnp.array([[1, 5, 63, 0, 0, 0, 0, 0]], jnp.int32)
    hidden, pooled = tower.apply({"params": merged}, toks)
    assert hidden.shape == (1, 8, 16) and pooled.shape == (1, 12)


def test_clip_attn_mapping_matches_torch():
    """The packed-QKV -> per-head-kernel mapping must reproduce torch's
    nn.MultiheadAttention numerics exactly."""
    import torch
    import flax.linen as fnn
    from flax.traverse_util import unflatten_dict

    w, heads = 16, 2
    tm = torch.nn.MultiheadAttention(w, heads, batch_first=True)
    x = torch.randn(2, 5, w, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        ref, _ = tm(x, x, x, need_weights=False)
    sd = {f"transformer.resblocks.0.attn.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    mapped = weights_io._map_clip_tower(sd, heads)
    params = unflatten_dict({k[2:]: jnp.asarray(v)
                             for k, v in mapped.items()})
    mod = fnn.MultiHeadDotProductAttention(num_heads=heads,
                                           qkv_features=w)
    xj = jnp.asarray(x.numpy())
    out = mod.apply({"params": params}, xj, xj)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)
