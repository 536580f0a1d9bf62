"""WaDIQaM-NR — weighted-average deep IQA (flax, TPU-native).

The reference scores inpainted renders with
``pyiqa.create_metric('wadiqam_nr')``
(``/root/reference/metrics/metrics.py:113-124``). This is a from-scratch
flax implementation of the WaDIQaM no-reference branch (Bosse et al.,
"Deep Neural Networks for No-Reference and Full-Reference Image Quality
Assessment", IEEE TIP 2018):

- images are cut into 32x32 patches; each patch runs a VGG-like trunk
  (conv3x3 pairs at 32/64/128/256/512 channels, 2x2 maxpool after each
  pair) down to a 512-d descriptor;
- a quality head (FC 512-512-1) scores each patch and a weight head
  (FC 512-512-1, ReLU + eps) rates its relevance; the image score is
  the weight-normalized patch average Σ a_i h_i / Σ a_i.

Determinism note: the torch implementations sample random patch crops
per forward; here patches are the deterministic non-overlapping 32x32
grid (every pixel scored exactly once — the paper's estimator averaged
over patches, and the grid is its exhaustive variant). Weights import
from a torch state dict via :func:`import_wadiqam` (external artifact,
like MUSIQ/LPIPS — see README's artifact-unlock table); random-init
scores are meaningless but the machinery is fully testable.

TPU notes: the patch grid reshapes to one [P, 32, 32, 3] batch — a
single fused conv stack on the MXU, static shapes per image size.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_CHANNELS = (32, 64, 128, 256, 512)
PATCH = 32


class PatchTrunk(nn.Module):
    """Conv3x3 pair + maxpool per stage; [P, 32, 32, 3] -> [P, 512]."""

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(_CHANNELS):
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"conv{2 * i}")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"conv{2 * i + 1}")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x.reshape(x.shape[0], -1)      # [P, 512] (1x1x512)


class WaDIQaMNR(nn.Module):
    """[B, H, W, 3] in [0, 1] -> [B] quality scores."""

    @nn.compact
    def __call__(self, img):
        b, h, w, _ = img.shape
        hp, wp = h // PATCH, w // PATCH
        assert hp > 0 and wp > 0, "image smaller than one 32x32 patch"
        img = img[:, : hp * PATCH, : wp * PATCH]
        patches = img.reshape(b, hp, PATCH, wp, PATCH, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * hp * wp, PATCH, PATCH, 3)
        feat = PatchTrunk(name="trunk")(patches)          # [B*P, 512]
        hq = nn.relu(nn.Dense(512, name="fc1_q")(feat))
        hq = nn.Dense(1, name="fc2_q")(hq)                # patch scores
        ha = nn.relu(nn.Dense(512, name="fc1_w")(feat))
        ha = nn.relu(nn.Dense(1, name="fc2_w")(ha)) + 1e-6  # weights
        hq = hq.reshape(b, hp * wp)
        ha = ha.reshape(b, hp * wp)
        return jnp.sum(ha * hq, axis=1) / jnp.sum(ha, axis=1)


class WaDIQaMScorer:
    """Callable wrapper matching the reference's ``WADIQMA`` metric
    class (``metrics/metrics.py:113-124``): numpy [H, W, 3] in [0,1]
    -> float. Jit-caches per image shape."""

    def __init__(self, params: Dict):
        self.model = WaDIQaMNR()
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


# torch key prefixes of the common port (pyiqa wadiqam_arch naming);
# conv trunk keys are positional, heads are named. Override the table
# for other ports — torch WaDIQaM key spaces are not standardized.
_TORCH_HEADS = {
    "fc1_q": "fc1_q", "fc2_q": "fc2_q",
    "fc1_w": "fc1_w", "fc2_w": "fc2_w",
}


def import_wadiqam(state: Dict, head_map: Dict = _TORCH_HEADS) -> Dict:
    """torch state dict -> flax params tree.

    Expects trunk convs as ``features.{k}.weight/bias`` in layer order
    (k = the Sequential indices of the ten convs) and head FCs as
    ``{name}.weight/bias``; torch conv [O,I,Kh,Kw] -> flax
    [Kh,Kw,I,O], torch linear [O,I] -> flax [I,O]."""
    conv_keys = sorted(
        (k for k in state if k.startswith("features.")
         and k.endswith(".weight") and state[k].ndim == 4),
        key=lambda k: int(k.split(".")[1]))
    assert len(conv_keys) == 10, f"expected 10 convs, got {conv_keys}"
    trunk = {}
    for i, wk in enumerate(conv_keys):
        bk = wk.replace(".weight", ".bias")
        trunk[f"conv{i}"] = {
            "kernel": jnp.asarray(
                np.asarray(state[wk]).transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(state[bk]))}
    params = {"trunk": trunk}
    for ours, theirs in head_map.items():
        params[ours] = {
            "kernel": jnp.asarray(
                np.asarray(state[f"{theirs}.weight"]).T),
            "bias": jnp.asarray(np.asarray(state[f"{theirs}.bias"]))}
    return params
