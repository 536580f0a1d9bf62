"""Golden tests: flax DPT depth head vs transformers DPTForDepthEstimation.

The reference's gen_depth.py calls HF ``pipeline('depth-estimation')``
(Intel/dpt-large) over coarse renders
(``/root/reference/gs-simp/gen_depth.py:16-40``). The real dpt-large
weights don't exist in this environment; these tests pin the
architecture + importer against a tiny randomly-initialized torch
``DPTForDepthEstimation`` — the same torch-golden strategy as the
UNet/VAE/CLIP importer suites.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multiview_inpaint_tpu.models.dpt import (DPTConfig, DPTDepth,  # noqa
                                              estimate_depth, import_dpt)

TINY = dict(hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
            patch_size=16, image_size=64, out_indices=(0, 1, 2, 3),
            neck_hidden_sizes=(8, 12, 16, 16), fusion_hidden_size=16)


def _torch_model():
    from transformers import DPTConfig as TorchDPTConfig
    from transformers import DPTForDepthEstimation
    tcfg = TorchDPTConfig(
        hidden_size=TINY["hidden_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["mlp_dim"], image_size=TINY["image_size"],
        patch_size=TINY["patch_size"],
        backbone_out_indices=list(TINY["out_indices"]),
        neck_hidden_sizes=list(TINY["neck_hidden_sizes"]),
        fusion_hidden_size=TINY["fusion_hidden_size"],
        readout_type="project", reassemble_factors=[4, 2, 1, 0.5],
        is_hybrid=False, add_projection=False,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    model = DPTForDepthEstimation(tcfg).eval()
    # break the zero-init symmetry of heads/projections so the golden
    # actually exercises every mapped tensor
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in model.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))
    return model


@pytest.fixture(scope="module")
def pair():
    import jax
    import jax.numpy as jnp
    tm = _torch_model()
    cfg = DPTConfig(**TINY)
    fm = DPTDepth(cfg)
    ref = fm.init(jax.random.key(0),
                  jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = import_dpt(ref, sd, cfg)
    return tm, fm, params


def _compare(tm, fm, params, h, w, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))
                  ).predicted_depth.numpy()
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3)


def test_forward_native_grid(pair):
    tm, fm, params = pair
    _compare(tm, fm, params, 64, 64)


def test_forward_interpolated_posemb(pair):
    """Input off the native grid exercises the pos-embedding
    interpolation (square only: torch's plain-DPT neck derives the token
    grid as sqrt(seq) — the HF pipeline always feeds square crops)."""
    tm, fm, params = pair
    _compare(tm, fm, params, 96, 96, seed=1)


def test_import_total_coverage(pair):
    """Every torch tensor is consumed, every flax leaf filled — dropping
    a key from the state_dict must raise."""
    import jax
    import jax.numpy as jnp
    tm, fm, _ = pair
    cfg = DPTConfig(**TINY)
    ref = fm.init(jax.random.key(1),
                  jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd["neck.extra_unexpected"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        import_dpt(ref, sd, cfg)
    sd.pop("neck.extra_unexpected")
    sd.pop("head.head.4.bias")
    with pytest.raises(KeyError):
        import_dpt(ref, sd, cfg)


def test_estimate_depth_normalized(pair):
    """The pipeline wrapper returns a [0,1] disparity-style map at the
    source resolution (what gen_depth writes as 3-channel PNG)."""
    tm, fm, params = pair
    rgb = np.random.default_rng(2).uniform(size=(48, 40, 3))
    d = estimate_depth(fm, params, rgb, proc_size=64)
    assert d.shape == (48, 40)
    assert d.min() >= 0.0 and d.max() <= 1.0 + 1e-6


def test_load_dpt_torch_roundtrip(tmp_path, pair):
    """gen_depth's entry point: torch file -> inferred config -> params."""
    from multiview_inpaint_tpu.models.dpt import load_dpt_torch
    tm, fm, params = pair
    path = str(tmp_path / "dpt.ckpt")
    torch.save({"state_dict": tm.state_dict()}, path)
    cfg2, model2, params2 = load_dpt_torch(path, DPTConfig(**TINY))
    _compare(tm, model2, params2, 64, 64, seed=3)
