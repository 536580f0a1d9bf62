"""Numeric goldens: flax video layers vs independent torch oracles.

Round-1 gap: weight-import was validated for *coverage* only; the three
riskiest layer families (VideoResBlock + AlphaBlender mixing, the
SpatialVideoTransformer temporal path, the VAE VideoDecoder temporal
resblock) had no numeric check. Here each flax module runs with random
weights, the same weights are transposed into torch layout (the
weights_io convention: conv HWIO->OIHW, dense in,out -> out,in), and a
torch composition built from torch primitives (GroupNorm/Conv/Linear/
scaled_dot_product_attention) reproduces the reference semantics
(``video_model.py:12-82``, ``video_attention.py:147-302``,
``temporal_ae.py:16-289``). Outputs must agree to f32 tolerance.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402


def _randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    flat = flatten_dict(params)
    out = {}
    for k, v in flat.items():
        a = np.asarray(v)
        out[k] = (0.2 * rng.normal(size=a.shape)).astype(np.float32)
    return unflatten_dict(out)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv2d(x, kern, bias, padding=1):
    w = _t(np.transpose(np.asarray(kern), (3, 2, 0, 1)))
    return torch.nn.functional.conv2d(x, w, _t(bias), padding=padding)


def _conv3d(x, kern, bias, padding):
    w = _t(np.transpose(np.asarray(kern), (4, 3, 0, 1, 2)))
    return torch.nn.functional.conv3d(x, w, _t(bias), padding=padding)


def _linear(x, kern, bias=None):
    w = _t(np.asarray(kern).T)
    return torch.nn.functional.linear(
        x, w, None if bias is None else _t(bias))


def _gn(x, scale, bias, groups, eps):
    return torch.nn.functional.group_norm(x, groups, _t(scale), _t(bias),
                                          eps)


def _ln(x, p):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps=1e-6)


def _silu(x):
    return torch.nn.functional.silu(x)


# --------------------------------------------------------------------------
def test_video_resblock_matches_torch():
    from multiview_inpaint_tpu.diffusion.resblock import VideoResBlock

    b, t, hh, ww, cin, cout, cemb = 1, 3, 6, 5, 8, 8, 16
    mod = VideoResBlock(cout)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b * t, hh, ww, cin)).astype(np.float32)
    emb = rng.normal(size=(b * t, cemb)).astype(np.float32)
    ind = np.zeros((b, t), np.float32)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(emb),
                      t, jnp.asarray(ind))["params"]
    params = _randomize(params)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(emb), t, jnp.asarray(ind)))

    p = flatten_dict(params, sep="/")
    xt = _t(x).permute(0, 3, 1, 2)                    # [(bt), C, H, W]
    g = min(32, cin)

    def resblock2d(xt, pre):
        h = _gn(xt, p[f"{pre}/in_layers_0/norm/scale"],
                p[f"{pre}/in_layers_0/norm/bias"], g, 1e-5)
        h = _conv2d(_silu(h), p[f"{pre}/in_layers_2/kernel"],
                    p[f"{pre}/in_layers_2/bias"])
        eo = _linear(_silu(_t(emb)), p[f"{pre}/emb_layers_1/kernel"],
                     p[f"{pre}/emb_layers_1/bias"])
        h = h + eo[:, :, None, None]
        h = _gn(h, p[f"{pre}/out_layers_0/norm/scale"],
                p[f"{pre}/out_layers_0/norm/bias"], g, 1e-5)
        h = _conv2d(_silu(h), p[f"{pre}/out_layers_3/kernel"],
                    p[f"{pre}/out_layers_3/bias"])
        return xt + h

    xs = resblock2d(xt, "spatial")                    # [(bt), C, H, W]
    # temporal: [B, C, T, H, W]
    x5 = xs.reshape(b, t, cout, hh, ww).permute(0, 2, 1, 3, 4)
    pre = "time_stack"
    h = _gn(x5, p[f"{pre}/in_layers_0/norm/scale"],
            p[f"{pre}/in_layers_0/norm/bias"], g, 1e-5)
    h = _conv3d(_silu(h), p[f"{pre}/in_layers_2/kernel"],
                p[f"{pre}/in_layers_2/bias"], (1, 0, 0))
    eo = _linear(_silu(_t(emb)).reshape(b, t, cemb),
                 p[f"{pre}/emb_layers_1/kernel"],
                 p[f"{pre}/emb_layers_1/bias"])       # [B, T, C]
    h = h + eo.permute(0, 2, 1)[:, :, :, None, None]
    h = _gn(h, p[f"{pre}/out_layers_0/norm/scale"],
            p[f"{pre}/out_layers_0/norm/bias"], g, 1e-5)
    h = _conv3d(_silu(h), p[f"{pre}/out_layers_3/kernel"],
                p[f"{pre}/out_layers_3/bias"], (1, 0, 0))
    h = x5 + h
    a = torch.sigmoid(_t(p["time_mixer/mix_factor"]))[0]
    out = a * x5 + (1 - a) * h                        # video frames
    want = out.permute(0, 2, 3, 4, 1).reshape(b * t, hh, ww, cout)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------------
def _attention_torch(x, ctx, p, pre, heads):
    q = _linear(x, p[f"{pre}/to_q/kernel"])
    k = _linear(ctx, p[f"{pre}/to_k/kernel"])
    v = _linear(ctx, p[f"{pre}/to_v/kernel"])

    def split(z):
        b, l, d = z.shape
        return z.reshape(b, l, heads, d // heads).permute(0, 2, 1, 3)

    o = torch.nn.functional.scaled_dot_product_attention(
        split(q), split(k), split(v))
    b, h, l, dh = o.shape
    o = o.permute(0, 2, 1, 3).reshape(b, l, h * dh)
    return _linear(o, p[f"{pre}/to_out_0/kernel"],
                   p[f"{pre}/to_out_0/bias"])


def _geglu_torch(x, p, pre):
    h = _linear(x, p[f"{pre}/net_0_proj/kernel"],
                p[f"{pre}/net_0_proj/bias"])
    a, gate = h.chunk(2, dim=-1)
    h = a * torch.nn.functional.gelu(gate)
    return _linear(h, p[f"{pre}/net_2/kernel"], p[f"{pre}/net_2/bias"])


def test_spatial_video_transformer_matches_torch():
    from multiview_inpaint_tpu.diffusion.transformer import (
        SpatialVideoTransformer)

    b, t, hh, ww, c, heads, dh, ctx_dim = 1, 3, 4, 3, 16, 2, 8, 12
    mod = SpatialVideoTransformer(in_channels=c, n_heads=heads, d_head=dh,
                                  context_dim=ctx_dim)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(b * t, hh, ww, c)).astype(np.float32)
    context = rng.normal(size=(b * t, 5, ctx_dim)).astype(np.float32)
    ind = np.zeros((b, t), np.float32)
    params = mod.init(jax.random.key(0), jnp.asarray(x),
                      jnp.asarray(context), t, jnp.asarray(ind))["params"]
    params = _randomize(params, 5)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(context), t, jnp.asarray(ind)))

    p = flatten_dict(params, sep="/")
    inner = heads * dh
    xt = _t(x).permute(0, 3, 1, 2)
    g = min(32, c)
    h = _gn(xt, p["norm/norm/scale"], p["norm/norm/bias"], g, 1e-5)
    h = h.permute(0, 2, 3, 1).reshape(b * t, hh * ww, c)
    h = _linear(h, p["proj_in/kernel"], p["proj_in/bias"])

    # frame positional embedding ([cos|sin] ordering, max_period 1e4)
    frames = np.tile(np.arange(t), b * t // t)
    half = c // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = frames[:, None] * freqs[None]
    t_emb = _t(np.concatenate([np.cos(args), np.sin(args)],
                              -1).astype(np.float32))
    emb = _linear(t_emb, p["time_pos_embed_0/kernel"],
                  p["time_pos_embed_0/bias"])
    emb = _linear(_silu(emb), p["time_pos_embed_2/kernel"],
                  p["time_pos_embed_2/bias"])[:, None, :]

    # spatial BasicTransformerBlock
    pre = "transformer_blocks_0"
    ct = _t(context)
    h = _attention_torch(_ln(h, {"scale": p[f"{pre}/norm1/scale"],
                                 "bias": p[f"{pre}/norm1/bias"]}),
                         _ln(h, {"scale": p[f"{pre}/norm1/scale"],
                                 "bias": p[f"{pre}/norm1/bias"]}),
                         p, f"{pre}/attn1", heads) + h
    h = _attention_torch(_ln(h, {"scale": p[f"{pre}/norm2/scale"],
                                 "bias": p[f"{pre}/norm2/bias"]}),
                         ct, p, f"{pre}/attn2", heads) + h
    h = _geglu_torch(_ln(h, {"scale": p[f"{pre}/norm3/scale"],
                             "bias": p[f"{pre}/norm3/bias"]}),
                     p, f"{pre}/ff") + h

    # temporal VideoTransformerBlock on x + emb
    xm = h + emb
    s = hh * ww
    xm = xm.reshape(b, t, s, inner).permute(0, 2, 1, 3).reshape(
        b * s, t, inner)
    time_ctx = ct[::t].repeat_interleave(hh * ww, dim=0)
    pre = "time_stack_0"
    xm = _geglu_torch(_ln(xm, {"scale": p[f"{pre}/norm_in/scale"],
                               "bias": p[f"{pre}/norm_in/bias"]}),
                      p, f"{pre}/ff_in") + xm
    ln1 = _ln(xm, {"scale": p[f"{pre}/norm1/scale"],
                   "bias": p[f"{pre}/norm1/bias"]})
    xm = _attention_torch(ln1, ln1, p, f"{pre}/attn1", heads) + xm
    xm = _attention_torch(_ln(xm, {"scale": p[f"{pre}/norm2/scale"],
                                   "bias": p[f"{pre}/norm2/bias"]}),
                          time_ctx, p, f"{pre}/attn2", heads) + xm
    xm = _geglu_torch(_ln(xm, {"scale": p[f"{pre}/norm3/scale"],
                               "bias": p[f"{pre}/norm3/bias"]}),
                      p, f"{pre}/ff") + xm
    xm = xm.reshape(b, s, t, inner).permute(0, 2, 1, 3).reshape(
        b * t, s, inner)

    a = torch.sigmoid(_t(p["time_mixer/mix_factor"]))[0]
    h = a * h + (1 - a) * xm
    h = _linear(h, p["proj_out/kernel"], p["proj_out/bias"])
    want = h.reshape(b * t, hh, ww, c) + _t(x)
    # two attention blocks + three layernorms compound f32 noise
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=3e-4)


# --------------------------------------------------------------------------
def test_vae_video_resnet_block_matches_torch():
    from multiview_inpaint_tpu.diffusion.vae import VideoResnetBlock

    b, t, hh, ww, c = 1, 3, 6, 5, 8
    mod = VideoResnetBlock(c)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(b * t, hh, ww, c)).astype(np.float32)
    params = mod.init(jax.random.key(0), jnp.asarray(x), t)["params"]
    params = _randomize(params, 7)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), t))

    p = flatten_dict(params, sep="/")
    xt = _t(x).permute(0, 3, 1, 2)
    g = c  # channels not divisible by 32 -> per-channel groups

    # spatial ResnetBlock (eps 1e-6, VAE convention)
    h = _gn(xt, p["spatial/norm1/scale"], p["spatial/norm1/bias"], g,
            1e-6)
    h = _conv2d(_silu(h), p["spatial/conv1/kernel"],
                p["spatial/conv1/bias"])
    h = _gn(h, p["spatial/norm2/scale"], p["spatial/norm2/bias"], g, 1e-6)
    h = _conv2d(_silu(h), p["spatial/conv2/kernel"],
                p["spatial/conv2/bias"])
    xs = xt + h

    x5 = xs.reshape(b, t, c, hh, ww).permute(0, 2, 1, 3, 4)
    h = _gn(x5, p["time_stack_in_norm/scale"], p["time_stack_in_norm/bias"],
            g, 1e-5)
    h = _conv3d(_silu(h), p["time_stack_in_conv/kernel"],
                p["time_stack_in_conv/bias"], (1, 0, 0))
    h = _gn(h, p["time_stack_out_norm/scale"],
            p["time_stack_out_norm/bias"], g, 1e-5)
    h = _conv3d(_silu(h), p["time_stack_out_conv/kernel"],
                p["time_stack_out_conv/bias"], (1, 0, 0))
    h = x5 + h
    a = torch.sigmoid(_t(p["mix_factor"]))[0]
    out = a * h + (1 - a) * x5
    want = out.permute(0, 2, 3, 4, 1).reshape(b * t, hh, ww, c)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-5)
