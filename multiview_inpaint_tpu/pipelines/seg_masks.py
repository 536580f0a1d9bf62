"""Object segmentation masks for recomposition — reference stage 3.

The reference drops ``seg_gs.py`` into an external Grounding-DINO + SAM +
AOT install (``Segment-and-Track-Anything-Supplementary-Code``). This
stage produces ``inpaint/sam_mask/<scene_case>/ctrl_<k>/<mode>/NN.png``.

Two paths:
- ``--import_dir``: copy externally produced SAM masks into the contract
  layout (the reference workflow, with any segmenter);
- ``--auto``: native fallback — segment the inserted object as the
  box-constrained difference between the inpainted frames and the
  original renders (threshold + morphological cleanup), which is exact
  where the background is preserved by construction.

    python -m multiview_inpaint_tpu.pipelines.seg_masks \
        --scene_id <scene>_<case> --ctrl_id 0 --auto [--modes x1 x2]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from ..gs import scene_io
from ..gs.scene import Workspace


def _binary_cleanup(mask: np.ndarray, iters: int = 2) -> np.ndarray:
    """Cheap 3x3 morphological close/open via min/max filters."""
    def dilate(m):
        p = np.pad(m, 1)
        return np.max([p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
                       for dy in range(3) for dx in range(3)], axis=0)

    def erode(m):
        p = np.pad(m, 1, constant_values=1)
        return np.min([p[dy:dy + m.shape[0], dx:dx + m.shape[1]]
                       for dy in range(3) for dx in range(3)], axis=0)

    for _ in range(iters):
        mask = erode(dilate(mask))   # close
    for _ in range(iters):
        mask = dilate(erode(mask))   # open
    return mask


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene_id", required=True)
    p.add_argument("--ctrl_id", type=int, default=0)
    p.add_argument("--modes", nargs="+", default=["x1", "x2"])
    p.add_argument("--frames", type=int, default=14)
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--workspace", default=".")
    p.add_argument("--inpaint_root", default="inpaint",
                   help="inpaint hand-off dir (abs or relative to workspace)")
    p.add_argument("--import_dir", default=None,
                   help="directory of externally produced masks "
                        "(<mode>/NN.png)")
    p.add_argument("--auto", action="store_true",
                   help="difference-based native segmentation")
    p.add_argument("--threshold", type=float, default=0.08)
    args = p.parse_args(argv)

    ws = Workspace(args.workspace, args.inpaint_root)
    for mode in args.modes:
        out_dir = ws.sam_mask_dir(args.scene_id, args.ctrl_id, mode)
        os.makedirs(out_dir, exist_ok=True)
        if args.import_dir:
            src = os.path.join(args.import_dir, mode)
            for f in sorted(os.listdir(src)):
                shutil.copy(os.path.join(src, f), os.path.join(out_dir, f))
            print(f"imported {mode} masks -> {out_dir}")
            continue
        if not args.auto:
            raise SystemExit("pass --import_dir or --auto")
        seq = ws.seq_dir(args.scene_id, mode, args.iteration)
        inp = ws.inpainted_dir(args.scene_id, args.ctrl_id, mode)
        for i in range(args.frames):
            v = f"{i:02d}"
            inpainted = scene_io.load_image(os.path.join(inp, f"{v}.png"))
            # renders/box masks are at gen_seq's (SVD input) resolution;
            # compare at the inpainted frames' resolution
            res = (inpainted.shape[1], inpainted.shape[0])
            render = scene_io.load_image(os.path.join(seq, "renders",
                                                      f"{v}.png"),
                                         resolution=res)
            box = scene_io.load_image(os.path.join(seq, "mask",
                                                   f"{v}.png"),
                                      resolution=res, grayscale=True)
            diff = np.abs(inpainted - render).mean(axis=-1)
            mask = ((diff > args.threshold) & (box > 0.5)).astype(
                np.float32)
            mask = _binary_cleanup(mask)
            scene_io.save_image(os.path.join(out_dir, f"{v}.png"), mask)
        print(f"auto {mode} masks -> {out_dir}")


if __name__ == "__main__":
    main()
