"""LPIPS perceptual distance (VGG16 backbone) — reference
``gs-simp/lpipsPyTorch``.

Flax VGG16 feature trunk + the LPIPS recipe: per-layer unit-normalized
feature differences, squared, 1x1 "lin" reweighting, spatial mean, summed
over the five relu stages. Weights import from torchvision's ``vgg16``
state dict plus the lpips ``vgg.pth`` lin weights via
:func:`import_torch_weights` (zero-egress containers supply the files).
Random-init use is meaningless for absolute scores but the machinery is
fully testable.
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers) per stage; relu at each conv,
# maxpool between stages. LPIPS taps the last relu of each stage.
_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        conv_i = 0
        for stage, (ch, n_layers) in enumerate(_STAGES):
            for _ in range(n_layers):
                x = nn.Conv(ch, (3, 3), name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
            feats.append(x)
            if stage != len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [-1, 1] -> [B] distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        a = (a - shift) / scale
        b = (b - shift) / scale
        vgg = VGG16Features(name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-10)
            y = y / jnp.linalg.norm(y, axis=-1, keepdims=True).clip(1e-10)
            d = (x - y) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False,
                        name=f"lin_{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def import_torch_weights(flax_params: Dict, vgg_state: Dict,
                         lpips_state: Dict) -> Dict:
    """torchvision vgg16 ``features.N.weight`` + lpips ``lin{i}.model.1``
    -> our tree."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = dict(flatten_dict(flax_params))
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for ci, ti in enumerate(torch_idx):
        w = vgg_state[f"features.{ti}.weight"]
        bkey = f"features.{ti}.bias"
        flat[("vgg", f"conv_{ci}", "kernel")] = jnp.asarray(
            np.asarray(w).transpose(2, 3, 1, 0))
        flat[("vgg", f"conv_{ci}", "bias")] = jnp.asarray(
            np.asarray(vgg_state[bkey]))
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lpips_state:
                flat[(f"lin_{i}", "kernel")] = jnp.asarray(
                    np.asarray(lpips_state[k]).transpose(2, 3, 1, 0))
                break
    return unflatten_dict(flat)
