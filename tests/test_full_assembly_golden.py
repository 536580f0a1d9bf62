"""Full-assembly numeric golden: tiny VideoUNet + ControlNet vs torch.

Round-2 gap (VERDICT item 4): layer goldens pinned VideoResBlock /
SpatialVideoTransformer / VAE-resblock numerics, but the riskiest
remaining surface was the *wiring* — the decoder's
``cat([h, hs.pop() + control.pop()])`` order, the middle-residual add,
and the hint-add placement right after the input conv
(``/root/reference/svd_inpaint1/models/csvd.py:79-91,180-227``). Here a
2-level, 2-frame, 8-channel UNet+ControlNet runs in flax with random
(non-zero — so wiring mistakes can't hide behind zero convs) weights,
and an independent torch composition written block-by-block in the
reference's forward order must reproduce the output to f32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

import torch_oracles as to  # noqa: E402  (tests/ is rootdir-importable)

B, T, H, W = 1, 2, 8, 8
CTX_L, CTX_D = 5, 12
ADM = 6


def _randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    flat = flatten_dict(params)
    return unflatten_dict({
        k: (0.2 * rng.normal(size=np.asarray(v).shape)).astype(np.float32)
        for k, v in flat.items()})


def _tiny_cfg():
    from multiview_inpaint_tpu.diffusion.unet import UNetConfig
    return UNetConfig(in_channels=4, model_channels=8, out_channels=4,
                      num_res_blocks=1, attention_resolutions=(1, 2),
                      channel_mult=(1, 2), num_head_channels=4,
                      transformer_depth=1, context_dim=CTX_D,
                      adm_in_channels=ADM)


# ---------------------------------------------------------------- oracles
def _vres(x4, emb, p, pre, cout):
    """VideoResBlock oracle: x4 [(bt), C, H, W] -> [(bt), cout, H, W]."""
    cin = x4.shape[1]
    h = to.gn(x4, p[f"{pre}/spatial/in_layers_0/norm/scale"],
              p[f"{pre}/spatial/in_layers_0/norm/bias"], min(32, cin),
              1e-5)
    h = to.conv2d(to.silu(h), p[f"{pre}/spatial/in_layers_2/kernel"],
                  p[f"{pre}/spatial/in_layers_2/bias"])
    eo = to.linear(to.silu(emb), p[f"{pre}/spatial/emb_layers_1/kernel"],
                   p[f"{pre}/spatial/emb_layers_1/bias"])
    h = h + eo[:, :, None, None]
    h = to.gn(h, p[f"{pre}/spatial/out_layers_0/norm/scale"],
              p[f"{pre}/spatial/out_layers_0/norm/bias"], min(32, cout),
              1e-5)
    h = to.conv2d(to.silu(h), p[f"{pre}/spatial/out_layers_3/kernel"],
                  p[f"{pre}/spatial/out_layers_3/bias"])
    skip = x4
    if cin != cout:
        skip = to.conv2d(x4, p[f"{pre}/spatial/skip_connection/kernel"],
                         p[f"{pre}/spatial/skip_connection/bias"],
                         padding=0)
    xs = skip + h

    x5 = xs.reshape(B, T, cout, xs.shape[2], xs.shape[3]).permute(
        0, 2, 1, 3, 4)
    h = to.gn(x5, p[f"{pre}/time_stack/in_layers_0/norm/scale"],
              p[f"{pre}/time_stack/in_layers_0/norm/bias"],
              min(32, cout), 1e-5)
    h = to.conv3d(to.silu(h), p[f"{pre}/time_stack/in_layers_2/kernel"],
                  p[f"{pre}/time_stack/in_layers_2/bias"], (1, 0, 0))
    eo = to.linear(to.silu(emb).reshape(B, T, -1),
                   p[f"{pre}/time_stack/emb_layers_1/kernel"],
                   p[f"{pre}/time_stack/emb_layers_1/bias"])
    h = h + eo.permute(0, 2, 1)[:, :, :, None, None]
    h = to.gn(h, p[f"{pre}/time_stack/out_layers_0/norm/scale"],
              p[f"{pre}/time_stack/out_layers_0/norm/bias"],
              min(32, cout), 1e-5)
    h = to.conv3d(to.silu(h), p[f"{pre}/time_stack/out_layers_3/kernel"],
                  p[f"{pre}/time_stack/out_layers_3/bias"], (1, 0, 0))
    h = x5 + h
    a = torch.sigmoid(to.t(p[f"{pre}/time_mixer/mix_factor"]))[0]
    out = a * x5 + (1 - a) * h
    return out.permute(0, 2, 3, 4, 1).reshape(
        B * T, xs.shape[2], xs.shape[3], cout).permute(0, 3, 1, 2)


def _svt(x4, ctx, p, pre, heads, dh):
    """SpatialVideoTransformer oracle (depth 1, use_linear)."""
    import math
    bt, c, hh, ww = x4.shape
    inner = heads * dh
    h = to.gn(x4, p[f"{pre}/norm/norm/scale"], p[f"{pre}/norm/norm/bias"],
              min(32, c), 1e-5)
    h = h.permute(0, 2, 3, 1).reshape(bt, hh * ww, c)
    h = to.linear(h, p[f"{pre}/proj_in/kernel"], p[f"{pre}/proj_in/bias"])

    frames = np.tile(np.arange(T), bt // T)
    half = c // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = frames[:, None] * freqs[None]
    t_emb = to.t(np.concatenate([np.cos(args), np.sin(args)],
                                -1).astype(np.float32))
    emb = to.linear(t_emb, p[f"{pre}/time_pos_embed_0/kernel"],
                    p[f"{pre}/time_pos_embed_0/bias"])
    emb = to.linear(to.silu(emb), p[f"{pre}/time_pos_embed_2/kernel"],
                    p[f"{pre}/time_pos_embed_2/bias"])[:, None, :]

    blk = f"{pre}/transformer_blocks_0"
    n1 = to.ln(h, p[f"{blk}/norm1/scale"], p[f"{blk}/norm1/bias"])
    h = to.attention(n1, n1, p, f"{blk}/attn1", heads) + h
    h = to.attention(to.ln(h, p[f"{blk}/norm2/scale"],
                           p[f"{blk}/norm2/bias"]),
                     ctx, p, f"{blk}/attn2", heads) + h
    h = to.geglu(to.ln(h, p[f"{blk}/norm3/scale"], p[f"{blk}/norm3/bias"]),
                 p, f"{blk}/ff") + h

    xm = h + emb
    s = hh * ww
    xm = xm.reshape(B, T, s, inner).permute(0, 2, 1, 3).reshape(
        B * s, T, inner)
    time_ctx = ctx[::T].repeat_interleave(s, dim=0)
    blk = f"{pre}/time_stack_0"
    xm = to.geglu(to.ln(xm, p[f"{blk}/norm_in/scale"],
                        p[f"{blk}/norm_in/bias"]), p, f"{blk}/ff_in") + xm
    n1 = to.ln(xm, p[f"{blk}/norm1/scale"], p[f"{blk}/norm1/bias"])
    xm = to.attention(n1, n1, p, f"{blk}/attn1", heads) + xm
    xm = to.attention(to.ln(xm, p[f"{blk}/norm2/scale"],
                            p[f"{blk}/norm2/bias"]),
                      time_ctx, p, f"{blk}/attn2", heads) + xm
    xm = to.geglu(to.ln(xm, p[f"{blk}/norm3/scale"],
                        p[f"{blk}/norm3/bias"]), p, f"{blk}/ff") + xm
    xm = xm.reshape(B, s, T, inner).permute(0, 2, 1, 3).reshape(
        bt, s, inner)

    a = torch.sigmoid(to.t(p[f"{pre}/time_mixer/mix_factor"]))[0]
    h = a * h + (1 - a) * xm
    h = to.linear(h, p[f"{pre}/proj_out/kernel"],
                  p[f"{pre}/proj_out/bias"])
    return h.reshape(bt, hh, ww, c).permute(0, 3, 1, 2) + x4


def _emb_oracle(p, tt, y, pre=""):
    import math
    half = 4
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = np.asarray(tt, np.float32)[:, None] * freqs[None]
    t_emb = to.t(np.concatenate([np.cos(args), np.sin(args)],
                                -1).astype(np.float32))
    emb = to.linear(t_emb, p[f"{pre}time_embed_0/kernel"],
                    p[f"{pre}time_embed_0/bias"])
    emb = to.linear(to.silu(emb), p[f"{pre}time_embed_2/kernel"],
                    p[f"{pre}time_embed_2/bias"])
    lab = to.linear(to.t(y), p[f"{pre}label_emb_0_0/kernel"],
                    p[f"{pre}label_emb_0_0/bias"])
    lab = to.linear(to.silu(lab), p[f"{pre}label_emb_0_2/kernel"],
                    p[f"{pre}label_emb_0_2/bias"])
    return emb + lab


def _encoder_oracle(p, pre, x4, emb, ctx, hint4=None):
    """Encoder + middle in the reference's block order. Returns
    (middle, hs) where hs mirrors the torch ModuleList appends."""
    h = to.conv2d(x4, p[f"{pre}input_blocks_0_0/kernel"],
                  p[f"{pre}input_blocks_0_0/bias"])
    if hint4 is not None:
        h = h + hint4
    hs = [h]
    h = _vres(h, emb, p, f"{pre}input_blocks_1_0", 8)
    h = _svt(h, ctx, p, f"{pre}input_blocks_1_1", 2, 4)
    hs.append(h)
    h = to.conv2d(h, p[f"{pre}input_blocks_2_0/op/kernel"],
                  p[f"{pre}input_blocks_2_0/op/bias"], stride=2)
    hs.append(h)
    h = _vres(h, emb, p, f"{pre}input_blocks_3_0", 16)
    h = _svt(h, ctx, p, f"{pre}input_blocks_3_1", 4, 4)
    hs.append(h)
    h = _vres(h, emb, p, f"{pre}middle_block_0", 16)
    h = _svt(h, ctx, p, f"{pre}middle_block_1", 4, 4)
    h = _vres(h, emb, p, f"{pre}middle_block_2", 16)
    return h, hs


def test_video_attn_block_matches_torch():
    """VideoDecoder temporal-attention block (``temporal_ae.py:158-289``
    VideoBlock) vs torch — unused at the shipped conv-only config but
    required for time_mode="all"/"attn-only" parity (VERDICT item 4b)."""
    import math

    from multiview_inpaint_tpu.diffusion.vae import VideoAttnBlock

    b, t, hh, ww, c = 1, 3, 4, 3, 8
    mod = VideoAttnBlock()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(b * t, hh, ww, c)).astype(np.float32)
    params = _randomize(mod.init(jax.random.key(0), jnp.asarray(x),
                                 t)["params"], seed=31)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), t))

    p = flatten_dict(params, sep="/")
    xt = to.t(x).permute(0, 3, 1, 2)
    s = hh * ww
    # spatial single-head attention (model.py AttnBlock.attention)
    hn = to.gn(xt, p["norm/scale"], p["norm/bias"], c, 1e-6)

    def qkv(name):
        z = to.conv2d(hn, p[f"{name}/kernel"], p[f"{name}/bias"],
                      padding=0)
        return z.reshape(b * t, c, s).permute(0, 2, 1)

    q, k, v = qkv("q"), qkv("k"), qkv("v")
    attn = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
    h = attn @ v                                        # [(bt), s, c]

    # frame positional embedding + video_time_embed MLP
    frames = np.tile(np.arange(t), b * t // t)
    half = c // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = frames[:, None] * freqs[None]
    t_emb = to.t(np.concatenate([np.cos(args), np.sin(args)],
                                -1).astype(np.float32))
    emb = to.linear(t_emb, p["video_time_embed_0/kernel"],
                    p["video_time_embed_0/bias"])
    emb = to.linear(to.silu(emb), p["video_time_embed_2/kernel"],
                    p["video_time_embed_2/bias"])[:, None, :]

    # temporal VideoTransformerBlock (1 head, d_head=c, ff_in, no ctx)
    xm = (h + emb).reshape(b, t, s, c).permute(0, 2, 1, 3).reshape(
        b * s, t, c)
    blk = "time_mix_block"
    xm = to.geglu(to.ln(xm, p[f"{blk}/norm_in/scale"],
                        p[f"{blk}/norm_in/bias"]), p, f"{blk}/ff_in") + xm
    n1 = to.ln(xm, p[f"{blk}/norm1/scale"], p[f"{blk}/norm1/bias"])
    xm = to.attention(n1, n1, p, f"{blk}/attn1", 1) + xm
    n2 = to.ln(xm, p[f"{blk}/norm2/scale"], p[f"{blk}/norm2/bias"])
    xm = to.attention(n2, n2, p, f"{blk}/attn2", 1) + xm
    xm = to.geglu(to.ln(xm, p[f"{blk}/norm3/scale"],
                        p[f"{blk}/norm3/bias"]), p, f"{blk}/ff") + xm
    xm = xm.reshape(b, s, t, c).permute(0, 2, 1, 3).reshape(b * t, s, c)

    a = torch.sigmoid(to.t(p["mix_factor"]))[0]
    h = a * h + (1 - a) * xm
    h = h.permute(0, 2, 1).reshape(b * t, c, hh, ww)
    h = xt + to.conv2d(h, p["proj_out/kernel"], p["proj_out/bias"],
                       padding=0)
    want = h.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_full_unet_controlnet_assembly_matches_torch():
    from multiview_inpaint_tpu.diffusion.controlnet import ControlNet
    from multiview_inpaint_tpu.diffusion.unet import VideoUNet

    cfg = _tiny_cfg()
    rng = np.random.default_rng(11)
    x = rng.normal(size=(B * T, H, W, 4)).astype(np.float32)
    hint = rng.normal(size=(B * T, H * 8, W * 8, 7)).astype(np.float32)
    ctx = rng.normal(size=(B * T, CTX_L, CTX_D)).astype(np.float32)
    y = rng.normal(size=(B * T, ADM)).astype(np.float32)
    tt = rng.uniform(0, 999, (B * T,)).astype(np.float32)
    ind = np.zeros((B, T), np.float32)

    unet = VideoUNet(cfg)
    cnet = ControlNet(cfg)
    uparams = _randomize(unet.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(tt),
        context=jnp.asarray(ctx), y=jnp.asarray(y), num_video_frames=T,
        image_only_indicator=jnp.asarray(ind))["params"], seed=21)
    cparams = _randomize(cnet.init(
        jax.random.key(1), jnp.asarray(x), jnp.asarray(hint),
        jnp.asarray(tt), context=jnp.asarray(ctx), y=jnp.asarray(y),
        num_video_frames=T,
        image_only_indicator=jnp.asarray(ind))["params"], seed=22)

    control = cnet.apply(
        {"params": cparams}, jnp.asarray(x), jnp.asarray(hint),
        jnp.asarray(tt), context=jnp.asarray(ctx), y=jnp.asarray(y),
        num_video_frames=T, image_only_indicator=jnp.asarray(ind))
    assert len(control) == 5
    got = np.asarray(unet.apply(
        {"params": uparams}, jnp.asarray(x), jnp.asarray(tt),
        context=jnp.asarray(ctx), y=jnp.asarray(y), num_video_frames=T,
        image_only_indicator=jnp.asarray(ind), control=list(control)))

    # ---------------- torch oracle, reference forward order -----------
    pu = flatten_dict(uparams, sep="/")
    pc = flatten_dict(cparams, sep="/")
    x4 = to.t(x).permute(0, 3, 1, 2)
    ctx3 = to.t(ctx)

    # ControlNet: hint block -> trunk encoder -> zero convs.
    hh = to.t(hint).permute(0, 3, 1, 2)
    chans = [16, 16, 32, 32, 96, 96, 256]
    strides = [1, 1, 2, 1, 2, 1, 2]
    for i, (c, s) in enumerate(zip(chans, strides)):
        hh = to.silu(to.conv2d(hh, pc[f"input_hint_block_{2 * i}/kernel"],
                               pc[f"input_hint_block_{2 * i}/bias"],
                               stride=s))
    guided = to.conv2d(hh, pc["input_hint_block_14/kernel"],
                       pc["input_hint_block_14/bias"])
    emb_c = _emb_oracle(pc, tt, y, pre="trunk/")
    mid_c, feats = _encoder_oracle(pc, "trunk/", x4, emb_c, ctx3,
                                   hint4=guided)
    ctrl = []
    for i, f in enumerate(feats):
        ctrl.append(to.conv2d(f, pc[f"zero_convs_{i}_0/kernel"],
                              pc[f"zero_convs_{i}_0/bias"], padding=0))
    ctrl.append(to.conv2d(mid_c, pc["middle_block_out_0/kernel"],
                          pc["middle_block_out_0/bias"], padding=0))
    for a, b in zip(control, ctrl):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(), rtol=2e-3,
            atol=2e-3)

    # Main UNet with control residuals (csvd.py:79-91).
    emb = _emb_oracle(pu, tt, y)
    h, hs = _encoder_oracle(pu, "", x4, emb, ctx3)
    h = h + ctrl.pop()
    # output_blocks: cat([h, hs.pop() + control.pop()]) each step.
    h = _vres(torch.cat([h, hs.pop() + ctrl.pop()], dim=1), emb, pu,
              "output_blocks_0_0", 16)
    h = _svt(h, ctx3, pu, "output_blocks_0_1", 4, 4)
    h = _vres(torch.cat([h, hs.pop() + ctrl.pop()], dim=1), emb, pu,
              "output_blocks_1_0", 16)
    h = _svt(h, ctx3, pu, "output_blocks_1_1", 4, 4)
    h = torch.nn.functional.interpolate(h, scale_factor=2,
                                        mode="nearest")
    h = to.conv2d(h, pu["output_blocks_1_2/conv/kernel"],
                  pu["output_blocks_1_2/conv/bias"])
    h = _vres(torch.cat([h, hs.pop() + ctrl.pop()], dim=1), emb, pu,
              "output_blocks_2_0", 8)
    h = _svt(h, ctx3, pu, "output_blocks_2_1", 2, 4)
    h = _vres(torch.cat([h, hs.pop() + ctrl.pop()], dim=1), emb, pu,
              "output_blocks_3_0", 8)
    h = _svt(h, ctx3, pu, "output_blocks_3_1", 2, 4)
    assert not hs and not ctrl
    h = to.gn(h, pu["out_0/norm/scale"], pu["out_0/norm/bias"],
              min(32, 8), 1e-5)
    h = to.conv2d(to.silu(h), pu["out_2/kernel"], pu["out_2/bias"])
    want = h.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
