"""SVD multi-view inpainting datasets (host-side numpy, NHWC).

Parity with the paper's data plumbing in ``sgm/data/my_dataset.py``:

- :class:`GSVideoForwardDataset` == GS_VideoForwardDatasetSimp (:1473-1551),
  the inference dataset: for every curated control image
  ``<root>/ctrl1/<scene>/<ctrl>.png`` x orbit mode, loads the 14 orbit
  renders + estimated depths + box masks and builds the 7-channel
  ``control_hint = [depth(3) | mask(1) | frames*(1-mask)(3)]``.
- :class:`EstSVDForwardDataset` == EstSVDForwardDatasetSimp (:2345-2418),
  the training dataset over synthetic ``%09d/{rgb,est_depth,masks}``
  scenes with random sequence-reversal augmentation.

Conventions preserved: RGB frames scaled to [-1, 1]; depth and masks in
[0, 1]; fps_id/motion_bucket/cond_aug broadcast per frame; images resized
to (H, W) = ``size``.

Batches are plain dicts of numpy arrays; :func:`collate` stacks them for
the engine. No torch DataLoader — an epoch iterator with prefetch is
plenty for 14-frame clips, and the arrays go straight to device.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Tuple

import numpy as np

from ..gs import scene_io


def _load(path, size: Tuple[int, int], to_rgb=True, scale=True,
          grayscale=False):
    """size = (H, W); returns [H, W, C] (or [H, W, 1] grayscale)."""
    h, w = size
    img = scene_io.load_image(path, resolution=(w, h), grayscale=grayscale)
    if grayscale:
        img = img[..., None]
    if scale:
        img = img * 2.0 - 1.0
    return img.astype(np.float32)


HINT_MODES = {
    # channel compositions of the reference's dataset family
    # (my_dataset.py control_hint variants):
    "full": 7,        # depth(3) | mask(1) | frames*(1-mask)(3)
    "nodepth": 4,     # mask(1) | frames*(1-mask)(3)
    "frames_only": 3,  # frames*(1-mask)(3)         ("nomask" ablation)
    "extended": 8,    # depth(3) | mask(1) | frames*(1-mask)(3) | (1-mask)
}


def _video_batch(frames, controls, masks, cond_frame, fps_id,
                 motion_bucket_id, cond_aug, rng=None,
                 hint_mode: str = "full") -> Dict:
    frames = np.stack(frames)         # [T, H, W, 3] in [-1, 1]
    controls = np.stack(controls)     # [T, H, W, 3] in [0, 1]
    masks = np.stack(masks)           # [T, H, W, 1] in [0, 1]
    bg = 1.0 - masks
    if hint_mode == "nodepth":
        hint = np.concatenate([masks, frames * bg], axis=-1)
    elif hint_mode == "frames_only":
        hint = frames * bg
    elif hint_mode == "extended":
        hint = np.concatenate([controls, masks, frames * bg, bg], axis=-1)
    else:
        hint = np.concatenate([controls, masks, frames * bg], axis=-1)
    t = frames.shape[0]
    noise = (rng.standard_normal(cond_frame.shape).astype(np.float32)
             if rng is not None else 0.0)
    return {
        "jpg": frames,
        "control_hint": hint,
        "masks": masks,
        "cond_frames_without_noise": cond_frame[None],
        "cond_frames": (cond_frame + cond_aug * noise)[None],
        "fps_id": np.full((1,), fps_id, np.float32),
        "motion_bucket_id": np.full((1,), motion_bucket_id, np.float32),
        "cond_aug": np.full((1,), cond_aug, np.float32),
        "image_only_indicator": np.zeros((1, t), np.float32),
        "num_video_frames": t,
    }


class GSVideoForwardDataset:
    """Inference dataset over the gs/ directory contract."""

    def __init__(self, data_root: str, size=(512, 384),
                 motion_bucket_id=127, fps_id=6, num_frames=14,
                 cond_aug=0.0, modes=("x1", "x2"), iteration=30000,
                 hint_mode: str = "full"):
        self.hint_mode = hint_mode
        self.root = data_root
        self.size = tuple(size)
        self.motion_bucket_id = motion_bucket_id
        self.fps_id = fps_id
        self.num_frames = num_frames
        self.cond_aug = cond_aug
        self.modes = list(modes)
        self.iteration = iteration
        scenes = sorted(os.listdir(os.path.join(data_root, "ctrl1")))
        self.items: List[Tuple[str, str]] = []
        for scene in scenes:
            for ctrl in sorted(os.listdir(
                    os.path.join(data_root, "ctrl1", scene))):
                self.items.append((scene, ctrl))

    def __len__(self):
        return len(self.items) * len(self.modes)

    def meta(self, index) -> Tuple[str, str, str]:
        scene, ctrl = self.items[index // len(self.modes)]
        return scene, ctrl, self.modes[index % len(self.modes)]

    def __getitem__(self, index) -> Dict:
        scene, ctrl, mode = self.meta(index)
        seq = os.path.join(self.root, "seq", scene, mode,
                           f"ours_{self.iteration}")
        depth = os.path.join(self.root, "depth", scene, mode)
        cond = _load(os.path.join(self.root, "ctrl1", scene, ctrl),
                     self.size)
        frames, controls, masks = [], [], []
        for i in range(self.num_frames):
            v = f"{i:02d}"
            frames.append(_load(f"{seq}/renders/{v}.png", self.size))
            controls.append(_load(f"{depth}/{v}.png", self.size,
                                  scale=False))
            masks.append(_load(f"{seq}/mask/{v}.png", self.size,
                               scale=False, grayscale=True))
        return _video_batch(frames, controls, masks, cond, self.fps_id,
                            self.motion_bucket_id, self.cond_aug,
                            hint_mode=self.hint_mode)


class EstSVDForwardDataset:
    """Training dataset over synthetic %09d scene directories."""

    def __init__(self, data_root: str, size=(512, 384),
                 motion_bucket_id=127, fps_id=6, num_frames=14,
                 cond_aug=0.0, seed=0, hint_mode: str = "full"):
        self.hint_mode = hint_mode
        self.root = data_root
        self.size = tuple(size)
        self.motion_bucket_id = motion_bucket_id
        self.fps_id = fps_id
        self.num_frames = num_frames
        self.cond_aug = cond_aug
        self.scene_ids = sorted(os.listdir(data_root))
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.scene_ids)

    def __getitem__(self, index) -> Dict:
        root = os.path.join(self.root, f"{index:09d}")
        frames, controls, masks = [], [], []
        for i in range(self.num_frames):
            v = f"{i:05d}"
            frames.append(_load(f"{root}/rgb/{v}.png", self.size))
            controls.append(_load(f"{root}/est_depth/{v}.png", self.size,
                                  scale=False))
            masks.append(_load(f"{root}/masks/{v}.png", self.size,
                               scale=False, grayscale=True))
        if self.rng.random() > 0.5:  # sequence reversal augmentation
            frames.reverse()
            controls.reverse()
            masks.reverse()
        cond = frames[0].copy()
        return _video_batch(frames, controls, masks, cond, self.fps_id,
                            self.motion_bucket_id, self.cond_aug,
                            rng=self.np_rng if self.cond_aug > 0 else None,
                            hint_mode=self.hint_mode)


def epoch_iterator(dataset, shuffle=True, seed=0):
    order = list(range(len(dataset)))
    if shuffle:
        random.Random(seed).shuffle(order)
    for i in order:
        yield i, dataset[i]
