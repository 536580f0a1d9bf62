"""Text-grounded localization tests: window pyramid, CLIP
retrieval-grounding on a planted object, component filtering, and the
seg_masks --ground CLI path (native stand-in for the reference's
Grounding-DINO step, seg_gs.py:94-117)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multiview_inpaint_tpu.diffusion.clip_vit import (TINY_VIT,
                                                      CLIPVisionTower)
from multiview_inpaint_tpu.guidance.grounding import (CLIPGrounder,
                                                      box_to_mask,
                                                      filter_components,
                                                      grounding_windows)


def test_grounding_windows_cover_image():
    wins = grounding_windows(96, 128)
    assert wins[0].tolist() == [0, 0, 96, 128]  # full frame included
    assert (wins[:, 0] >= 0).all() and (wins[:, 1] >= 0).all()
    assert (wins[:, 2] <= 96).all() and (wins[:, 3] <= 128).all()
    cover = np.zeros((96, 128))
    for y0, x0, y1, x1 in wins[1:]:
        assert y1 - y0 == x1 - x0  # square sliding windows
        cover[y0:y1, x0:x1] = 1
    assert cover.mean() == 1.0  # the pyramid tiles every pixel


def _tiny_grounder(seed=0):
    vit = CLIPVisionTower(TINY_VIT)
    params = vit.init(jax.random.key(seed),
                      jnp.zeros((1, 32, 32, 3)))["params"]
    return CLIPGrounder(params, vit_cfg=TINY_VIT), vit, params


def _object_patch(size=40, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    return np.stack([yy, 1 - xx, (yy * xx)], -1).astype(np.float32)


def test_ground_box_finds_planted_object():
    """Retrieval grounding: query = the object's own embedding (what
    real text features provide with trained weights) must pick a
    window overlapping the planted object, not the noise background."""
    grounder, vit, params = _tiny_grounder()
    rng = np.random.default_rng(0)
    img = rng.uniform(0.4, 0.6, (96, 128, 3)).astype(np.float32)
    obj = _object_patch(40)
    img[8:48, 72:112] = obj

    q = vit.apply({"params": params}, jnp.asarray(
        np.asarray(jax.image.resize(jnp.asarray(obj),
                                    (224, 224, 3), "bilinear"))
        )[None] * 2.0 - 1.0)[0]
    (y0, x0, y1, x1), scores = grounder(img, np.asarray(q))
    gmask = box_to_mask((y0, x0, y1, x1), 96, 128)
    omask = box_to_mask((8, 72, 48, 112), 96, 128)
    inter = (gmask * omask).sum()
    iou = inter / (gmask.sum() + omask.sum() - inter)
    assert iou > 0.2, (iou, (y0, x0, y1, x1))
    assert len(scores) == len(grounding_windows(96, 128))


def test_filter_components_keeps_grounded_blob():
    mask = np.zeros((64, 64), np.float32)
    mask[5:15, 5:15] = 1.0     # distractor
    mask[40:60, 40:60] = 1.0   # object
    region = box_to_mask((35, 35, 64, 64), 64, 64)
    kept = filter_components(mask, region)
    assert kept[45, 45] == 1.0 and kept[10, 10] == 0.0
    # a region hitting nothing keeps nothing
    assert filter_components(mask, np.zeros_like(mask)).sum() == 0
    # empty mask passes through
    assert filter_components(np.zeros_like(mask), region).sum() == 0


def test_seg_masks_ground_cli(tmp_path):
    """End to end: two difference blobs inside the box; --ground with a
    planted query embedding keeps the named object's component and
    drops the spurious change (what DINO+SAM does in the reference)."""
    from multiview_inpaint_tpu.diffusion.checkpoint import save_params
    from multiview_inpaint_tpu.gs import scene_io
    from multiview_inpaint_tpu.pipelines import seg_masks

    root = str(tmp_path)
    h, w = 96, 128
    rng = np.random.default_rng(1)
    render = rng.uniform(0.4, 0.6, (h, w, 3)).astype(np.float32)
    inpainted = render.copy()
    obj = _object_patch(40)
    inpainted[8:48, 72:112] = obj              # the named object
    inpainted[60:80, 10:30] += 0.3             # spurious change
    inpainted = np.clip(inpainted, 0, 1)
    box = np.ones((h, w), np.float32)          # loose box: everything

    seq = os.path.join(root, "inpaint", "seq", "sc_case", "x1", "ours_7")
    inp = os.path.join(root, "inpaint", "inpainted", "sc_case", "ctrl_0",
                       "x1")
    os.makedirs(os.path.join(seq, "renders"))
    os.makedirs(os.path.join(seq, "mask"))
    os.makedirs(inp)
    scene_io.save_image(os.path.join(seq, "renders", "00.png"), render)
    scene_io.save_image(os.path.join(seq, "mask", "00.png"), box)
    scene_io.save_image(os.path.join(inp, "00.png"), inpainted)

    grounder, vit, params = _tiny_grounder()
    q = vit.apply({"params": params}, jnp.asarray(
        np.asarray(jax.image.resize(jnp.asarray(obj), (224, 224, 3),
                                    "bilinear")))[None] * 2.0 - 1.0)[0]
    ckpt = os.path.join(root, "clip.npz")
    save_params(ckpt, {"vision": params,
                       "text_features": np.asarray(q),
                       "vit_cfg": {k: np.asarray(v) for k, v in
                                   vars(TINY_VIT).items()}})

    seg_masks.main(["--scene_id", "sc_case", "--ctrl_id", "0",
                    "--modes", "x1", "--frames", "1", "--iteration", "7",
                    "--auto", "--workspace", root, "--no_bg_fit",
                    "--ground", "the object", "--clip_ckpt", ckpt])
    got = scene_io.load_image(
        os.path.join(root, "inpaint", "sam_mask", "sc_case", "ctrl_0",
                     "x1", "00.png"), grayscale=True) > 0.5
    assert got[8:48, 72:112].mean() > 0.5      # object kept
    assert got[60:80, 10:30].mean() < 0.05     # distractor dropped


def test_ground_adversarial_two_objects_shift_noise():
    """Adversarial grounding (round-3 VERDICT): TWO plausible structured
    objects in frame, a global color shift AND sampler-like pixel noise
    on top; the query names one of them and its components must win —
    both directions (either object as the query), so the test can't
    pass by luck of window layout. Reference bar: Grounding-DINO
    box_thr 0.35 on frame 0 (seg_gs.py:94-117)."""
    grounder, vit, params = _tiny_grounder()

    def embed(patch):
        return np.asarray(vit.apply({"params": params}, jnp.asarray(
            np.asarray(jax.image.resize(jnp.asarray(patch),
                                        (224, 224, 3), "bilinear"))
            )[None] * 2.0 - 1.0)[0])

    obj_a = _object_patch(40, seed=3)            # smooth gradient object
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:40, 0:40]
    obj_b = np.stack([((yy // 5 + xx // 5) % 2).astype(np.float32),
                      np.zeros((40, 40), np.float32),
                      ((xx // 7) % 2).astype(np.float32)], -1)  # checks

    boxes = {"a": (8, 10, 48, 50), "b": (50, 78, 90, 118)}
    base = rng.uniform(0.4, 0.6, (96, 128, 3)).astype(np.float32)
    base[8:48, 10:50] = obj_a
    base[50:90, 78:118] = obj_b
    # global color shift + sampler-noise-like perturbation
    img = np.clip(base + np.array([0.08, -0.05, 0.04], np.float32)
                  + rng.normal(0, 0.02, base.shape).astype(np.float32),
                  0, 1)

    masks = {k: box_to_mask(b, 96, 128) for k, b in boxes.items()}
    for named, other in (("a", "b"), ("b", "a")):
        q = embed(obj_a if named == "a" else obj_b)
        box, scores = grounder(img, q)
        g = box_to_mask(box, 96, 128)
        inter_n = (g * masks[named]).sum()
        iou_n = inter_n / (g.sum() + masks[named].sum() - inter_n)
        inter_o = (g * masks[other]).sum()
        assert iou_n > 0.2, (named, box, iou_n)
        assert inter_n > 2 * inter_o, (named, box)
        # component filtering: only the named object's blob survives
        diff_mask = masks["a"] + masks["b"]
        kept = filter_components(diff_mask, g, min_overlap=0.3)
        cy, cx = [(25, 30), (70, 98)][0 if named == "a" else 1]
        oy, ox = [(25, 30), (70, 98)][1 if named == "a" else 0]
        assert kept[cy, cx] == 1.0, named
        assert kept[oy, ox] == 0.0, named
