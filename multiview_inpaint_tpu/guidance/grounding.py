"""Text-grounded object localization with CLIP — the native stand-in
for the reference's Grounding-DINO detector
(``Segment-and-Track-Anything-Supplementary-Code/seg_gs.py:94-117``:
ground the named object on a frame, then segment/track it).

Zero-egress rebuild: no detector weights exist in this environment, but
the framework already carries both OpenCLIP towers
(``diffusion/clip_vit.py`` vision, ``diffusion/clip_text.py`` text +
BPE tokenizer, torch import via ``weights_io``). Grounding-by-retrieval:
score a multi-scale sliding-window pyramid of crops against the text
embedding (cosine similarity in the shared space) and return the best
window. Coarser than a trained detector but weight-unlockable with the
same public OpenCLIP checkpoint the pipeline's conditioner uses —
no third-party detector install.

TPU notes: every window crop resizes to the ViT input and the whole
pyramid scores in ONE batched vision-tower forward (static window
count per image size — jit-cached)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grounding_windows(h: int, w: int,
                      scales: Sequence[float] = (0.7, 0.5, 0.35),
                      stride_frac: float = 0.5) -> np.ndarray:
    """[K, 4] int boxes (y0, x0, y1, x1): a sliding pyramid at the given
    scales of min(h, w), plus the full frame."""
    boxes = [(0, 0, h, w)]
    base = min(h, w)
    for s in scales:
        win = max(16, int(round(base * s)))
        step = max(1, int(round(win * stride_frac)))
        ys = list(range(0, max(h - win, 0) + 1, step))
        xs = list(range(0, max(w - win, 0) + 1, step))
        if ys and ys[-1] != h - win and h > win:
            ys.append(h - win)
        if xs and xs[-1] != w - win and w > win:
            xs.append(w - win)
        for y0 in ys:
            for x0 in xs:
                boxes.append((y0, x0, y0 + win, x0 + win))
    return np.asarray(boxes, np.int32)


class CLIPGrounder:
    """Callable: (image [H, W, 3] in [0, 1], text or text embedding) ->
    (best box (y0, x0, y1, x1), per-window scores).

    ``vision_params`` drive :class:`diffusion.clip_vit.CLIPVisionTower`;
    ``text_params`` + a BPE vocab file unlock plain-text queries through
    :class:`diffusion.clip_text.CLIPTextTower`. Pass a precomputed
    ``text_features`` vector to skip the text tower (tests, cached
    prompts)."""

    def __init__(self, vision_params: Dict, vit_cfg=None,
                 text_params: Optional[Dict] = None, text_cfg=None,
                 bpe_path: Optional[str] = None):
        from ..diffusion.clip_vit import CLIPVisionTower, ViTConfig
        self.vit = CLIPVisionTower(vit_cfg or ViTConfig())
        self.vision_params = vision_params
        self.text_params = text_params
        self.text_cfg = text_cfg
        self.bpe_path = bpe_path
        self._embed = jax.jit(lambda p, x: self.vit.apply({"params": p},
                                                          x))
        self._text_fn = None

    def text_features(self, text: str) -> jnp.ndarray:
        if self.text_params is None or self.bpe_path is None:
            raise ValueError(
                "text queries need text_params + bpe_path (external "
                "OpenCLIP artifacts); pass text_features directly "
                "otherwise")
        from ..diffusion.clip_text import (CLIPTextTower, SimpleTokenizer,
                                           TextConfig)
        if self._text_fn is None:
            cfg = self.text_cfg or TextConfig()
            tower = CLIPTextTower(cfg)
            self._text_fn = jax.jit(
                lambda p, toks: tower.apply({"params": p}, toks)[1])
            self._tokenizer = SimpleTokenizer(self.bpe_path,
                                              cfg.context_length)
        toks = jnp.asarray(self._tokenizer([text]))
        return self._text_fn(self.text_params, toks)[0]

    def __call__(self, image: np.ndarray, text,
                 windows: Optional[np.ndarray] = None
                 ) -> Tuple[Tuple[int, int, int, int], np.ndarray]:
        h, w = image.shape[:2]
        if windows is None:
            windows = grounding_windows(h, w)
        tfeat = (self.text_features(text) if isinstance(text, str)
                 else jnp.asarray(text))
        size = self.vit.cfg.image_size
        # One batched resize per window SCALE (windows of one scale
        # share a shape), not one eager device round trip per window —
        # per-call fetches over the axon tunnel cost a full round trip
        # each (CLAUDE.md).
        img = np.asarray(image, np.float32)
        crops = np.empty((len(windows), size, size, 3), np.float32)
        sizes = {}
        for k, (y0, x0, y1, x1) in enumerate(windows):
            sizes.setdefault((y1 - y0, x1 - x0), []).append(k)
        for (wh, ww), ks in sizes.items():
            batch = jnp.asarray(np.stack(
                [img[windows[k][0]:windows[k][2],
                     windows[k][1]:windows[k][3]] for k in ks]))
            resized = jax.image.resize(
                batch, (len(ks), size, size, 3), method="bilinear")
            crops[np.asarray(ks)] = np.asarray(resized)
        emb = self._embed(self.vision_params,
                          jnp.asarray(crops) * 2.0 - 1.0)   # [K, D]
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        tfeat = tfeat / jnp.linalg.norm(tfeat)
        scores = np.asarray(emb @ tfeat)
        best = windows[int(np.argmax(scores))]
        return tuple(int(v) for v in best), scores


def filter_components(mask: np.ndarray, region: np.ndarray,
                      min_overlap: float = 0.05) -> np.ndarray:
    """Keep the connected components of ``mask`` that overlap ``region``
    (a binary map) by at least ``min_overlap`` of their area — the
    'segment only the named object' step the reference delegates to
    Grounding-DINO boxes feeding SAM."""
    from scipy import ndimage

    labels, n = ndimage.label(mask > 0.5)
    if n == 0:
        return mask
    keep = np.zeros_like(mask)
    for lab in range(1, n + 1):
        comp = labels == lab
        if region[comp].mean() >= min_overlap:
            keep[comp] = 1.0
    return keep


def box_to_mask(box: Tuple[int, int, int, int], h: int,
                w: int) -> np.ndarray:
    y0, x0, y1, x1 = box
    m = np.zeros((h, w), np.float32)
    m[max(y0, 0):min(y1, h), max(x0, 0):min(x1, w)] = 1.0
    return m
