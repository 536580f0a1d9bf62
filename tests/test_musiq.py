"""MUSIQ (flax): forward shapes, multi-scale token math, torch import."""

import jax
import jax.numpy as jnp
import numpy as np

from multiview_inpaint_tpu.metrics.musiq import (MUSIQ, MUSIQConfig,
                                                 MUSIQScorer, TINY_MUSIQ,
                                                 _arp_size, _grid_index,
                                                 import_musiq)


def test_arp_and_grid():
    assert _arp_size(480, 640, 384) == (288, 384)
    assert _arp_size(640, 480, 384) == (384, 288)
    gi = _grid_index(4, 8, 4)
    assert gi.shape == (32,)
    assert gi.min() >= 0 and gi.max() < 16
    # normalized: first row maps to grid row 0, last to grid row 3
    assert gi[0] == 0 and gi[-1] == 15


def test_forward_and_scorer():
    model = MUSIQ(TINY_MUSIQ)
    img = jnp.asarray(np.random.default_rng(0).random((1, 96, 128, 3)),
                      jnp.float32)
    params = model.init(jax.random.key(0), img)["params"]
    out = model.apply({"params": params}, img)
    assert out.shape == (1,)
    scorer = MUSIQScorer(params, TINY_MUSIQ)
    s1 = scorer(np.asarray(img[0]))
    s2 = scorer(np.asarray(img[0]))
    assert s1 == s2 and np.isfinite(s1)
    # different content -> different score
    assert scorer(np.zeros((96, 128, 3), np.float32)) != s1


def test_import_musiq_total_coverage():
    import torch
    cfg = TINY_MUSIQ
    model = MUSIQ(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.key(0), img)["params"]
    rng = np.random.default_rng(1)
    d, mlp, g, s = cfg.dim, cfg.mlp_dim, cfg.grid, len(cfg.scales) + 1
    sd = {
        "embedding.patch_projection.weight":
            rng.normal(size=(d, 32 * 32 * 3)).astype(np.float32),
        "embedding.patch_projection.bias":
            rng.normal(size=(d,)).astype(np.float32),
        "embedding.spatial_embedding":
            rng.normal(size=(g * g, d)).astype(np.float32),
        "embedding.scale_embedding":
            rng.normal(size=(s, d)).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "norm.weight": rng.normal(size=(d,)).astype(np.float32),
        "norm.bias": rng.normal(size=(d,)).astype(np.float32),
        "head.weight": rng.normal(size=(1, d)).astype(np.float32),
        "head.bias": rng.normal(size=(1,)).astype(np.float32),
    }
    for i in range(cfg.layers):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = rng.normal(size=(d,)).astype(np.float32)
        sd[f"{pre}.norm1.bias"] = rng.normal(size=(d,)).astype(np.float32)
        sd[f"{pre}.norm2.weight"] = rng.normal(size=(d,)).astype(np.float32)
        sd[f"{pre}.norm2.bias"] = rng.normal(size=(d,)).astype(np.float32)
        sd[f"{pre}.attn.in_proj_weight"] = rng.normal(
            size=(3 * d, d)).astype(np.float32)
        sd[f"{pre}.attn.in_proj_bias"] = rng.normal(
            size=(3 * d,)).astype(np.float32)
        sd[f"{pre}.attn.out_proj.weight"] = rng.normal(
            size=(d, d)).astype(np.float32)
        sd[f"{pre}.attn.out_proj.bias"] = rng.normal(
            size=(d,)).astype(np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.normal(
            size=(mlp, d)).astype(np.float32)
        sd[f"{pre}.mlp.fc1.bias"] = rng.normal(size=(mlp,)).astype(
            np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.normal(
            size=(d, mlp)).astype(np.float32)
        sd[f"{pre}.mlp.fc2.bias"] = rng.normal(size=(d,)).astype(
            np.float32)
    merged, missing, unexpected = import_musiq(params, sd,
                                               heads=cfg.heads)
    assert unexpected == [], unexpected[:5]
    assert missing == [], missing[:5]
    out = model.apply({"params": merged}, img)
    assert np.isfinite(float(out[0]))
