"""WaDIQaM-NR (flax): forward/scorer behavior, torch golden + import
coverage, weighted patch pooling, cmp CLI wiring (reference
``metrics/metrics.py:113-124`` WADIQMA via pyiqa wadiqam_nr)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.metrics.wadiqam import (WaDIQaMNR,
                                                   WaDIQaMScorer,
                                                   import_wadiqam)


def _init_params(seed=0, h=64, w=96):
    model = WaDIQaMNR()
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    return model, model.init(jax.random.key(seed), img)["params"]


def test_forward_and_scorer():
    model, params = _init_params()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 64, 96, 3)), jnp.float32)
    out = model.apply({"params": params}, img)
    assert out.shape == (2,)
    scorer = WaDIQaMScorer(params)
    s1 = scorer(np.asarray(img[0]))
    assert s1 == scorer(np.asarray(img[0])) and np.isfinite(s1)
    assert scorer(np.zeros((64, 96, 3), np.float32)) != s1
    # non-multiple-of-32 sizes crop like the torch ports
    s3 = scorer(np.asarray(rng.random((70, 100, 3)), np.float32))
    assert np.isfinite(s3)


def _torch_wadiqam(n_convs=10):
    import torch.nn as tnn

    chans = [32, 32, 64, 64, 128, 128, 256, 256, 512, 512]
    seq, prev = [], 3
    for i, ch in enumerate(chans):
        seq += [tnn.Conv2d(prev, ch, 3, padding=1), tnn.ReLU()]
        if i % 2 == 1:
            seq += [tnn.MaxPool2d(2)]
        prev = ch
    feats = tnn.Sequential(*seq)
    heads = {n: tnn.Linear(512, 512) if n.startswith("fc1")
             else tnn.Linear(512, 1)
             for n in ("fc1_q", "fc2_q", "fc1_w", "fc2_w")}
    return feats, heads


def test_torch_golden_and_import_coverage():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    feats, heads = _torch_wadiqam()
    rng = np.random.default_rng(1)
    state = {}
    for k, v in feats.state_dict().items():
        state[f"features.{k}"] = rng.normal(
            0, 0.05, v.shape).astype(np.float32)
    for n, m in heads.items():
        for k, v in m.state_dict().items():
            state[f"{n}.{k}"] = rng.normal(
                0, 0.05, v.shape).astype(np.float32)
    feats.load_state_dict({k[len("features."):]: torch.from_numpy(v)
                           for k, v in state.items()
                           if k.startswith("features.")})
    for n, m in heads.items():
        m.load_state_dict({k: torch.from_numpy(state[f"{n}.{k}"])
                           for k in ("weight", "bias")})

    params = import_wadiqam(state)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    got = float(WaDIQaMNR().apply({"params": params},
                                  jnp.asarray(img))[0])

    with torch.no_grad():
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        # the same deterministic 32x32 grid
        patches = (x.unfold(2, 32, 32).unfold(3, 32, 32)
                   .permute(0, 2, 3, 1, 4, 5).reshape(-1, 3, 32, 32))
        f = feats(patches).reshape(patches.shape[0], 512)
        hq = heads["fc2_q"](F.relu(heads["fc1_q"](f)))
        ha = F.relu(heads["fc2_w"](F.relu(heads["fc1_w"](f)))) + 1e-6
        want = float((ha * hq).sum() / ha.sum())
    assert got == pytest.approx(want, rel=1e-4)


def test_weighted_pooling_properties():
    """The pooling is a normalized weighted mean: scaling every patch
    weight by a constant leaves the score unchanged, and the score
    stays within the per-patch score range (a convex combination)."""
    model, params = _init_params(h=32, w=128)  # four patches
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 32, 128, 3)), jnp.float32)
    base = float(model.apply({"params": params}, img)[0])

    p10 = jax.tree_util.tree_map(lambda a: a, params)
    p10["fc2_w"] = {"kernel": params["fc2_w"]["kernel"] * 10.0,
                    "bias": params["fc2_w"]["bias"] * 10.0}
    scaled = float(model.apply({"params": p10}, img)[0])
    assert scaled == pytest.approx(base, rel=1e-4)

    # convexity: per-patch scores bound the pooled score. Each 32x32
    # patch scored alone == that patch's hq (single-patch pooling).
    patch_scores = [float(model.apply(
        {"params": params}, img[:, :, 32 * i: 32 * (i + 1)])[0])
        for i in range(4)]
    assert min(patch_scores) - 1e-5 <= base <= max(patch_scores) + 1e-5


def test_cmp_cli_with_wadiqam(tmp_path):
    from multiview_inpaint_tpu.diffusion.checkpoint import save_params
    from multiview_inpaint_tpu.gs import scene_io
    from multiview_inpaint_tpu.pipelines import cmp

    _, params = _init_params(h=64, w=64)
    ckpt = os.path.join(str(tmp_path), "wadiqam.npz")
    save_params(ckpt, params)

    root = os.path.join(str(tmp_path), "exp")
    rdir = os.path.join(root, "inpainted", "toy_case", "ours_7",
                        "renders")
    os.makedirs(rdir)
    rng = np.random.default_rng(3)
    for i in range(3):
        scene_io.save_image(os.path.join(rdir, f"{i:02d}.png"),
                            rng.random((64, 64, 3)).astype(np.float32))
    out = os.path.join(str(tmp_path), "report.json")
    cmp.main(["--root", root, "--iteration", "7", "--n_frame", "3",
              "--out", out, "--wadiqam_ckpt", ckpt])
    report = json.load(open(out))
    assert np.isfinite(report["toy_case"]["wadiqam"])
