"""End-to-end smoke tests for the stage-2 / SVD / eval pipeline CLIs.

Round-1 gap: only 6 of ~16 pipeline ``main()``s ran under pytest. This
module drives the remaining ones at toy sizes against one shared fixture
workspace, asserting the directory contract between stages (reference
flow: README.md gen_seq -> gen_depth -> ctrl/svd inpainting ->
seg masks -> inpaint_rec -> vis_render -> cmp).
"""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

import fixtures
from multiview_inpaint_tpu.config.registries import FRONT_VIEWS
from multiview_inpaint_tpu.gs import gaussians, scene_io
from multiview_inpaint_tpu.pipelines import (cmp, ctrl_inpaint, delete,
                                             divide_test, gen_depth,
                                             gen_seq, inpaint_rec,
                                             sds_train, seg_masks,
                                             simple_video_sample,
                                             svd_test, svd_train,
                                             train_gs, vis, vis_render)

IT = 40           # background model iteration
SDS_IT = 12       # coarse (sds) model iteration
REC_IT = 8        # stage-2 reconstruction iteration
FRAMES = 3
SIZE = (64, 48)   # (H, W) for the SVD stages


@pytest.fixture(scope="module")
def ws2(tmp_path_factory):
    """Shared workspace: trained bg model + del + gen_seq artifacts."""
    root = tmp_path_factory.mktemp("ws2")
    src = str(root / "dataset" / "toy")
    fixtures.make_colmap_scene(src)
    model = str(root / "output" / "toy")
    train_gs.main([
        "-s", src, "-m", model, "--resolution", "1",
        "--iterations", str(IT), "--densify_from_iter", "100000",
        "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", str(IT),
        "--max_per_tile", "256", "--log_interval", "20",
    ])
    FRONT_VIEWS["toy"] = "view00"
    box_path = os.path.join(str(root), "bds", "add", "toy_case.obj")
    fixtures.write_cube_obj(box_path, center=(0.2, 0.1, 0), half=0.3)
    delete.main(["-m", model, "--box", box_path, "--iteration", str(IT)])
    gen_seq.main(["-s", src, "-m", model, "--scene_id", "toy_case",
                  "--resolution", "1", "--iteration", str(IT),
                  "--workspace", str(root), "--frames", str(FRAMES),
                  "--max_per_tile", "256", "--allow_default_orbit"])
    yield {"root": str(root), "src": src, "model": model}
    FRONT_VIEWS.pop("toy", None)


def test_sds_train_cli(ws2):
    out = os.path.join(ws2["root"], "output_sds", "toy_case")
    sds_train.main([
        "-s", ws2["src"], "-m", out, "--scene_id", "toy_case",
        "--bg_model", ws2["model"], "--bg_iteration", str(IT),
        "--workspace", ws2["root"], "--resolution", "1", "--no_sds",
        "--iterations", str(SDS_IT), "--save_iterations", str(SDS_IT),
        "--densify_from_iter", "100000", "--opacity_reset_interval",
        "100000", "--n_samples", "512", "--max_per_tile", "256",
        "--log_interval", "4",
    ])
    ply = os.path.join(out, "point_cloud", f"iteration_{SDS_IT}",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert int(gaussians.load_ply(ply, 0).num_live()) > 0


def test_gen_depth_cli(ws2):
    sds_model = os.path.join(ws2["root"], "output_sds", "toy_case")
    assert os.path.isdir(sds_model), "run after test_sds_train_cli"
    gen_depth.main([
        "-s", ws2["src"], "-m", ws2["model"], "--scene_id", "toy_case",
        "--resolution", "1", "--workspace", ws2["root"],
        "--sds_model", sds_model, "--sds_iteration", str(SDS_IT),
        "--frames", str(FRAMES), "--allow_default_orbit",
    ])
    for mode in ("x1", "x2"):
        d = os.path.join(ws2["root"], "inpaint", "depth", "toy_case",
                         mode)
        files = sorted(os.listdir(d))
        assert len(files) == FRAMES
        img = scene_io.load_image(os.path.join(d, files[0]))
        assert img.shape[-1] == 3 and img.max() <= 1.0


def test_gen_depth_dpt_cli(ws2, tmp_path):
    """--dpt_ckpt routes the renders through the native monocular DPT
    head (the reference's HF pipeline role) instead of exact disparity."""
    torch = pytest.importorskip("torch")
    from test_dpt import TINY, _torch_model
    ckpt = str(tmp_path / "dpt.ckpt")
    # num_heads is not shape-inferable; ship the config in the file
    torch.save({"state_dict": _torch_model().state_dict(),
                "config": dict(TINY)}, ckpt)
    sds_model = os.path.join(ws2["root"], "output_sds", "toy_case")
    assert os.path.isdir(sds_model), "run after test_sds_train_cli"
    gen_depth.main([
        "-s", ws2["src"], "-m", ws2["model"], "--scene_id", "toy_case",
        "--resolution", "1", "--workspace", ws2["root"],
        "--sds_model", sds_model, "--sds_iteration", str(SDS_IT),
        "--frames", "2", "--modes", "x1", "--allow_default_orbit",
        "--dpt_ckpt", ckpt, "--dpt_size", str(TINY["image_size"]),
    ])
    d = os.path.join(ws2["root"], "inpaint", "depth", "toy_case", "x1")
    files = sorted(os.listdir(d))
    assert len(files) >= 2
    img = scene_io.load_image(os.path.join(d, files[0]))
    assert img.shape[-1] == 3 and 0.0 <= img.min() and img.max() <= 1.0


def test_gen_depth_rejects_unknown_scene(ws2):
    with pytest.raises(KeyError):
        gen_depth.main([
            "-s", ws2["src"], "-m", ws2["model"], "--scene_id",
            "nosuchscene_case", "--workspace", ws2["root"],
            "--frames", "2"])


def test_svd_test_cli(ws2):
    # the svd stage reads the gs/ hand-off tree = <ws>/inpaint
    data_root = os.path.join(ws2["root"], "inpaint")
    ctrl_dir = os.path.join(data_root, "ctrl1", "toy_case")
    os.makedirs(ctrl_dir, exist_ok=True)
    # curated control image named ctrl_0 so the direct-frame output dir
    # matches the ws.inpainted_dir(ctrl_id=0) contract
    shutil.copy(os.path.join(data_root, "seq", "toy_case", "x1",
                             f"ours_{IT}", "renders", "00.png"),
                os.path.join(ctrl_dir, "ctrl_0.png"))
    logdir = os.path.join(ws2["root"], "logs", "test")
    svd_test.main([
        "--data_root", data_root, "--logdir", logdir,
        "--tiny_model", "--num_frames", str(FRAMES), "--num_steps", "2",
        "--size", str(SIZE[0]), str(SIZE[1]), "--iteration", str(IT),
    ])
    grids = os.listdir(os.path.join(logdir, "log_img", "test"))
    assert len(grids) == 2  # one per mode
    for mode in ("x1", "x2"):
        d = os.path.join(data_root, "inpainted", "toy_case", "ctrl_0",
                         mode)
        assert len(os.listdir(d)) == FRAMES
        img = scene_io.load_image(os.path.join(d, "00.png"))
        assert img.shape == (SIZE[0], SIZE[1], 3)


def test_svd_test_blended_sampling(ws2):
    data_root = os.path.join(ws2["root"], "inpaint")
    logdir = os.path.join(ws2["root"], "logs", "test_blend")
    svd_test.main([
        "--data_root", data_root, "--logdir", logdir,
        "--out", os.path.join(ws2["root"], "inp_blend"),
        "--tiny_model", "--num_frames", str(FRAMES), "--num_steps", "2",
        "--size", str(SIZE[0]), str(SIZE[1]), "--iteration", str(IT),
        "--modes", "x1", "--sampling", "blended",
    ])
    d = os.path.join(ws2["root"], "inp_blend", "toy_case", "ctrl_0", "x1")
    assert len(os.listdir(d)) == FRAMES


def test_divide_test_cli(ws2, tmp_path):
    grid_dir = os.path.join(ws2["root"], "logs", "test", "log_img",
                            "test")
    assert os.path.isdir(grid_dir), "run after test_svd_test_cli"
    out = str(tmp_path / "divided")
    divide_test.main([
        "--grid_dir", grid_dir, "--out", out,
        "--items", "toy_case:ctrl_0:x1", "toy_case:ctrl_0:x2",
        "--frame_size", str(SIZE[0]), str(SIZE[1]),
        "--num_frames", str(FRAMES),
    ])
    for mode in ("x1", "x2"):
        d = os.path.join(out, "toy_case", "ctrl_0", mode)
        assert len(os.listdir(d)) == FRAMES
    assert os.path.exists(os.path.join(out, "vis_video", "toy_case",
                                       "ctrl_0.gif"))
    # split frames match svd_test's direct per-frame outputs
    a = scene_io.load_image(os.path.join(out, "toy_case", "ctrl_0", "x1",
                                         "00.png"))
    b = scene_io.load_image(os.path.join(ws2["root"], "inpaint",
                                         "inpainted", "toy_case",
                                         "ctrl_0", "x1", "00.png"))
    assert np.abs(a - b).max() < 0.02  # one png quantization step


def test_seg_masks_cli(ws2):
    seg_masks.main([
        "--scene_id", "toy_case", "--ctrl_id", "0", "--auto",
        "--frames", str(FRAMES), "--iteration", str(IT),
        "--workspace", ws2["root"],
    ])
    for mode in ("x1", "x2"):
        d = os.path.join(ws2["root"], "inpaint", "sam_mask", "toy_case",
                         "ctrl_0", mode)
        files = os.listdir(d)
        assert len(files) == FRAMES
        m = scene_io.load_image(os.path.join(d, files[0]),
                                grayscale=True)
        assert set(np.unique(np.round(m * 255))) <= {0.0, 255.0}


def test_seg_masks_import_dir(ws2, tmp_path):
    src = tmp_path / "ext"
    for mode in ("x1",):
        os.makedirs(src / mode)
        for i in range(FRAMES):
            Image.fromarray(np.full((8, 8), 255, np.uint8)).save(
                src / mode / f"{i:02d}.png")
    seg_masks.main([
        "--scene_id", "toy_case", "--ctrl_id", "7", "--modes", "x1",
        "--import_dir", str(src), "--workspace", ws2["root"],
    ])
    d = os.path.join(ws2["root"], "inpaint", "sam_mask", "toy_case",
                     "ctrl_7", "x1")
    assert len(os.listdir(d)) == FRAMES


def test_inpaint_rec_cli(ws2):
    out = os.path.join(ws2["root"], "output_rec", "toy_case")
    inpaint_rec.main([
        "-s", ws2["src"], "-m", out, "--scene_id", "toy_case",
        "--ctrl_id", "0", "--bg_model", ws2["model"],
        "--bg_iteration", str(IT), "--workspace", ws2["root"],
        "--resolution", "1", "--frames", str(FRAMES),
        "--iterations", str(REC_IT), "--save_iterations", str(REC_IT),
        "--densify_from_iter", "100000", "--opacity_reset_interval",
        "100000", "--n_samples", "512", "--max_per_tile", "256",
        "--log_interval", "4",
    ])
    ply = os.path.join(out, "ctrl_0", "point_cloud",
                       f"iteration_{REC_IT}", "point_cloud.ply")
    assert os.path.exists(ply)
    assert int(gaussians.load_ply(ply, 0).num_live()) > 0


def test_vis_render_and_vis_cli(ws2):
    rec = os.path.join(ws2["root"], "output_rec", "toy_case", "ctrl_0")
    assert os.path.isdir(rec), "run after test_inpaint_rec_cli"
    vis_render.main([
        "-s", ws2["src"], "-m", ws2["model"], "--scene_id", "toy_case",
        "--resolution", "1", "--workspace", ws2["root"],
        "--rec_model", rec, "--iteration", str(REC_IT), "--frames", "4",
    ])
    rdir = os.path.join(ws2["root"], "vis", "vis_video", "inpainted",
                        "toy_case", "ctrl_0", "renders")
    assert len(os.listdir(rdir)) == 3  # reversed(x1)[:-1] + x2[1:]
    # background sweep
    vis_render.main([
        "-s", ws2["src"], "-m", ws2["model"], "--scene_id", "toy_case",
        "--resolution", "1", "--workspace", ws2["root"], "--src",
        "--iteration", str(IT), "--frames", "4",
    ])
    sdir = os.path.join(ws2["root"], "vis", "vis_video", "src",
                        "toy_case", "renders")
    assert len(os.listdir(sdir)) == 3
    vis.main(["--frames_dir", rdir])
    assert os.path.exists(os.path.join(os.path.dirname(rdir),
                                       "video.gif"))


def test_cmp_cli(ws2, tmp_path):
    # build the vis/cmp tree from the vis_render outputs
    root = str(tmp_path / "cmp_exp")
    rdir = os.path.join(ws2["root"], "vis", "vis_video", "inpainted",
                        "toy_case", "ctrl_0", "renders")
    sdir = os.path.join(ws2["root"], "vis", "vis_video", "src",
                        "toy_case", "renders")
    shutil.copytree(rdir, os.path.join(root, "inpainted", "toy_case",
                                       f"ours_{REC_IT}", "renders"))
    shutil.copytree(sdir, os.path.join(root, "src", "toy",
                                       f"ours_{REC_IT}", "renders"))
    out = str(tmp_path / "report.json")
    cmp.main(["--root", root, "--iteration", str(REC_IT),
              "--n_frame", "3", "--out", out])
    report = json.load(open(out))
    assert "toy_case" in report and "mean" in report
    assert "sharpness" in report["toy_case"]
    assert "psnr_vs_src" in report["toy_case"]
    assert report["toy_case"]["psnr_vs_src"] > 10  # same scene, object add


def _write_est_scene(root, with_warp=False):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "est_depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"))
    if with_warp:
        os.makedirs(os.path.join(root, "depth"))
    h, w = SIZE
    for i in range(FRAMES):
        v = f"{i:05d}"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            f"{root}/rgb/{v}.png")
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            f"{root}/est_depth/{v}.png")
        m = np.zeros((h, w), np.uint8)
        m[16:40, 12:36] = 255
        Image.fromarray(m).save(f"{root}/masks/{v}.png")
        if with_warp:
            Image.fromarray(np.full((h, w), 2000, np.uint16)).save(
                f"{root}/depth/{v}.png")
    poses = np.tile(np.eye(4, dtype=np.float32), (FRAMES, 1, 1))
    for i in range(FRAMES):
        # non-colinear so no camera coincides with the mean orbit center
        poses[i, 0, 3] = 0.02 * i
        poses[i, 1, 3] = 0.015 * (i % 2)
    np.save(os.path.join(root, "poses.npy"), poses)
    if with_warp:
        K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1.0]])
        with open(os.path.join(root, "metadata"), "w") as f:
            json.dump({"w": w, "h": h, "K": list(K.T.reshape(-1))}, f)


def test_svd_train_cli(ws2, tmp_path):
    data = str(tmp_path / "est")
    _write_est_scene(os.path.join(data, "000000000"))
    logdir = str(tmp_path / "logs")
    svd_train.main([
        "--data_root", data, "--logdir", logdir, "--tiny_model",
        "--epochs", "1", "--devices", "1", "--num_frames", str(FRAMES),
        "--size", str(SIZE[0]), str(SIZE[1]), "--ckpt_every", "1",
        "--log_interval", "1", "--mask_shrink_k", "0.3", "--pose_cond",
    ])
    ckpts = os.listdir(os.path.join(logdir, "checkpoints"))
    assert any(c.startswith("epoch=") for c in ckpts)
    log = [json.loads(l) for l in
           open(os.path.join(logdir, "svd_train_log.jsonl"))]
    assert any(np.isfinite(r.get("loss", np.nan)) for r in log)


def test_svd_train_ckpt_rotation_and_final_ema_eval(ws2, tmp_path):
    data = str(tmp_path / "est_rot")
    _write_est_scene(os.path.join(data, "000000000"))
    logdir = str(tmp_path / "logs_rot")
    svd_train.main([
        "--data_root", data, "--logdir", logdir, "--tiny_model",
        "--epochs", "4", "--devices", "1", "--num_frames", str(FRAMES),
        "--size", str(SIZE[0]), str(SIZE[1]), "--ckpt_every", "1",
        "--log_interval", "1", "--ema", "--keep_last", "2",
        "--final_ema_eval", "1", "--lr", "0.05",
    ])
    ckpts = sorted(c for c in
                   os.listdir(os.path.join(logdir, "checkpoints"))
                   if c.startswith("epoch="))
    # 4 epochs ckpt'd every 1, rotated to the newest 2
    assert ckpts == ["epoch=000002.npz", "epoch=000003.npz"]
    log = [json.loads(l) for l in
           open(os.path.join(logdir, "svd_train_log.jsonl"))]
    fin = [r for r in log if r.get("event") == "final_ema_eval"]
    assert len(fin) == 1
    assert np.isfinite(fin[0]["loss_raw"])
    assert np.isfinite(fin[0]["loss_ema"])
    # 4 steps at decay 0.9999: EMA stays ~at init, raw has moved — the
    # two numbers must be genuinely different evaluations
    assert fin[0]["loss_raw"] != fin[0]["loss_ema"]


def test_svd_train_warp_cli(ws2, tmp_path):
    data = str(tmp_path / "warp")
    _write_est_scene(os.path.join(data, "000000000"), with_warp=True)
    logdir = str(tmp_path / "logs_warp")
    svd_train.main([
        "--data_root", data, "--logdir", logdir, "--tiny_model",
        "--epochs", "1", "--devices", "1", "--num_frames", str(FRAMES),
        "--size", str(SIZE[0]), str(SIZE[1]), "--ckpt_every", "1",
        "--log_interval", "1", "--warp_loss",
    ])
    ckpts = os.listdir(os.path.join(logdir, "checkpoints"))
    assert any(c.startswith("epoch=") for c in ckpts)


def test_simple_video_sample_cli(ws2, tmp_path, capsys):
    import numpy as np
    img = os.path.join(ws2["root"], "inpaint", "seq", "toy_case", "x1",
                       f"ours_{IT}", "renders", "00.png")
    out = str(tmp_path / "vid")
    # Always-trigger synthetic safety probes (huge positive bias):
    # exercises the whole CLIP-embed -> probe -> blur path end to end.
    heads = str(tmp_path / "heads.npz")
    d = 16  # tiny model's CLIP output_dim
    np.savez(heads,
             nsfw=np.concatenate([np.zeros(d), [100.0]]),
             watermark=np.concatenate([np.zeros(d), [-100.0]]))
    simple_video_sample.main([
        "--image", img, "--out", out, "--tiny_model",
        "--num_frames", str(FRAMES), "--num_steps", "2",
        "--size", str(SIZE[0]), str(SIZE[1]),
        "--safety_heads", heads,
    ])
    files = os.listdir(out)
    assert files, "no output frames/video written"
    assert f"safety filter blurred {FRAMES}/{FRAMES} frames" in \
        capsys.readouterr().out


def test_ctrl_inpaint_cli(ws2, tmp_path):
    import jax
    import jax.numpy as jnp
    import torch
    from flax.traverse_util import flatten_dict

    from multiview_inpaint_tpu.diffusion.controlnet2d import ControlNet2D
    from multiview_inpaint_tpu.diffusion.unet2d import (UNet2D,
                                                        UNet2DConfig)
    from multiview_inpaint_tpu.diffusion.vae import (AutoencoderKL,
                                                     VAEConfig)
    from test_weights_io import (_to_torch_layout, _unet_path_to_torch,
                                 _vae_path_to_torch)

    cfg2d = UNet2DConfig(model_channels=32, num_res_blocks=1,
                         attention_resolutions=(1,), channel_mult=(1, 2),
                         num_head_channels=16, context_dim=16)
    key = jax.random.key(0)
    size = 64
    s = size // 8
    up = UNet2D(cfg2d).init(key, jnp.zeros((1, s, s, 9)),
                            jnp.zeros((1,)),
                            jnp.zeros((1, 4, 16)))["params"]
    cp = ControlNet2D(cfg2d).init(key, jnp.zeros((1, s, s, 9)),
                                  jnp.zeros((1, size, size, 3)),
                                  jnp.zeros((1,)),
                                  jnp.zeros((1, 4, 16)))["params"]
    vp = AutoencoderKL(VAEConfig(ch=16, ch_mult=(1, 2, 4, 4),
                                 num_res_blocks=1),
                       video_decoder=False).init(
        key, jnp.zeros((1, 16, 16, 3)))["params"]

    rng = np.random.default_rng(0)

    def synth(params, prefix, keyfn):
        sd = {}
        for path, leaf in flatten_dict(params).items():
            tk = prefix + keyfn(list(path))
            sd[tk] = torch.from_numpy(_to_torch_layout(
                0.05 * rng.normal(size=np.asarray(leaf).shape)
                .astype(np.float32)))
        return sd

    def ctrl_key(parts):
        if parts[0] == "trunk":
            return _unet_path_to_torch(parts[1:])
        if parts[0].startswith("input_hint_block_"):
            idx = parts[0].rsplit("_", 1)[1]
            return (f"input_hint_block.{idx}."
                    + {"kernel": "weight", "bias": "bias"}[parts[1]])
        if parts[0].startswith("zero_convs_"):
            idx = parts[0].split("_")[2]
            return (f"zero_convs.{idx}.0."
                    + {"kernel": "weight", "bias": "bias"}[parts[1]])
        return ("middle_block_out.0."
                + {"kernel": "weight", "bias": "bias"}[parts[1]])

    sd = synth(up, "model.diffusion_model.", _unet_path_to_torch)
    sd.update(synth(vp, "first_stage_model.", _vae_path_to_torch))
    sd_path = str(tmp_path / "sd.ckpt")
    torch.save({"state_dict": sd}, sd_path)
    csd = synth(cp, "control_model.", ctrl_key)
    ctrl_path = str(tmp_path / "ctrl.ckpt")
    torch.save({"state_dict": csd}, ctrl_path)
    embs = str(tmp_path / "embs.npy")
    np.save(embs, rng.normal(size=(2, 4, 16)).astype(np.float32))

    ctrl_inpaint.main([
        "--scene_id", "toy_case", "--workspace", ws2["root"],
        "--sd_ckpt", sd_path, "--ctrl_ckpt", ctrl_path,
        "--text_embs", embs, "--tiny", "--context_dim", "16",
        "--size", str(size), "--iteration", str(IT),
        "--n_samples", "1", "--num_steps", "2",
    ])
    out = os.path.join(ws2["root"], "inpaint", "ctrl", "toy_case")
    assert os.path.exists(os.path.join(out, "ctrl_0.png"))


def test_auto_segmentation_quality_vs_ground_truth(tmp_path):
    """The native difference segmenter (seg_masks --auto) must recover
    the true object silhouette on a controlled scene: render a
    background, composite a known object over it inside the box mask,
    and compare the produced sam_mask against the object's true alpha
    (IoU). Validates the fallback the reference replaces with
    GroundingDINO+SAM (seg_gs.py:94-160)."""
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_gt_gaussians

    root = str(tmp_path)
    h, w = 48, 64
    bg_params = make_gt_gaussians(seed=1, spread=0.9)
    obj = make_gt_gaussians(n=12, seed=2, spread=0.15)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=0.9, fovy=0.7, width=w, height=h)
    rcam = RenderCamera.from_camera(cam)
    bgc = jnp.zeros(3)
    bg_out = render(bg_params, rcam, bgc, max_per_tile=256,
                    pair_budget=8 * bg_params.capacity)
    obj_out = render(obj, rcam, bgc, max_per_tile=256,
                     pair_budget=8 * obj.capacity)
    alpha = np.asarray(obj_out.alpha)
    true_mask = (alpha > 0.5).astype(np.float32)
    assert true_mask.sum() > 40  # the object is visibly there
    composited = (np.asarray(obj_out.rgb)
                  + np.asarray(bg_out.rgb) * (1 - alpha[..., None]))

    seq = os.path.join(root, "inpaint", "seq", "sc_case", "x1",
                       "ours_7")
    inp = os.path.join(root, "inpaint", "inpainted", "sc_case", "ctrl_0",
                       "x1")
    os.makedirs(os.path.join(seq, "renders"))
    os.makedirs(os.path.join(seq, "mask"))
    os.makedirs(inp)
    box = np.zeros((h, w), np.float32)
    ys, xs = np.where(true_mask > 0)
    box[max(0, ys.min() - 4):ys.max() + 5,
        max(0, xs.min() - 4):xs.max() + 5] = 1.0  # loose box mask
    for i in range(2):
        v = f"{i:02d}"
        scene_io.save_image(os.path.join(seq, "renders", f"{v}.png"),
                            np.asarray(bg_out.rgb))
        scene_io.save_image(os.path.join(seq, "mask", f"{v}.png"), box)
        scene_io.save_image(os.path.join(inp, f"{v}.png"), composited)

    seg_masks.main(["--scene_id", "sc_case", "--ctrl_id", "0",
                    "--modes", "x1", "--frames", "2", "--iteration", "7",
                    "--auto", "--workspace", root])
    got = scene_io.load_image(
        os.path.join(root, "inpaint", "sam_mask", "sc_case", "ctrl_0",
                     "x1", "00.png"), grayscale=True) > 0.5
    inter = float(np.logical_and(got, true_mask > 0).sum())
    union = float(np.logical_or(got, true_mask > 0).sum())
    assert inter / union > 0.6, f"IoU {inter / union:.2f}"


def test_auto_segmentation_survives_global_shift(tmp_path):
    """Realistic inpainted frames differ from the raw render globally
    (VAE round trip, lighting drift): perturb the composited frames
    with a brightness/contrast shift + noise and require the affine
    background fit to keep the difference segmenter above IoU 0.6
    (round-2 VERDICT weak #6)."""
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_gt_gaussians

    root = str(tmp_path)
    h, w = 48, 64
    rng = np.random.default_rng(9)
    bg_params = make_gt_gaussians(seed=1, spread=0.9)
    obj = make_gt_gaussians(n=12, seed=2, spread=0.15)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=0.9, fovy=0.7, width=w, height=h)
    rcam = RenderCamera.from_camera(cam)
    bgc = jnp.zeros(3)
    bg_out = render(bg_params, rcam, bgc, max_per_tile=256,
                    pair_budget=8 * bg_params.capacity)
    obj_out = render(obj, rcam, bgc, max_per_tile=256,
                     pair_budget=8 * obj.capacity)
    alpha = np.asarray(obj_out.alpha)
    true_mask = (alpha > 0.5).astype(np.float32)
    comp = (np.asarray(obj_out.rgb)
            + np.asarray(bg_out.rgb) * (1 - alpha[..., None]))
    # global gain/offset + sensor-ish noise (what the raw difference
    # thresholding cannot absorb)
    pert = np.clip(comp * 1.18 + 0.06
                   + rng.normal(0, 0.015, comp.shape), 0, 1)

    seq = os.path.join(root, "inpaint", "seq", "sc_case", "x1", "ours_7")
    inp = os.path.join(root, "inpaint", "inpainted", "sc_case", "ctrl_0",
                       "x1")
    os.makedirs(os.path.join(seq, "renders"))
    os.makedirs(os.path.join(seq, "mask"))
    os.makedirs(inp)
    box = np.zeros((h, w), np.float32)
    ys, xs = np.where(true_mask > 0)
    box[max(0, ys.min() - 4):ys.max() + 5,
        max(0, xs.min() - 4):xs.max() + 5] = 1.0
    for i in range(2):
        v = f"{i:02d}"
        scene_io.save_image(os.path.join(seq, "renders", f"{v}.png"),
                            np.asarray(bg_out.rgb))
        scene_io.save_image(os.path.join(seq, "mask", f"{v}.png"), box)
        scene_io.save_image(os.path.join(inp, f"{v}.png"), pert)

    seg_masks.main(["--scene_id", "sc_case", "--ctrl_id", "0",
                    "--modes", "x1", "--frames", "2", "--iteration", "7",
                    "--auto", "--workspace", root])
    got = scene_io.load_image(
        os.path.join(root, "inpaint", "sam_mask", "sc_case", "ctrl_0",
                     "x1", "00.png"), grayscale=True) > 0.5
    inter = float(np.logical_and(got, true_mask > 0).sum())
    union = float(np.logical_or(got, true_mask > 0).sum())
    assert inter / union > 0.6, f"IoU {inter / union:.2f}"
    # and the un-fit segmenter must actually be worse on this input,
    # or the perturbation isn't exercising anything
    seg_masks.main(["--scene_id", "sc_case", "--ctrl_id", "0",
                    "--modes", "x1", "--frames", "2", "--iteration", "7",
                    "--auto", "--no_bg_fit", "--workspace", root])
    raw = scene_io.load_image(
        os.path.join(root, "inpaint", "sam_mask", "sc_case", "ctrl_0",
                     "x1", "00.png"), grayscale=True) > 0.5
    inter_r = float(np.logical_and(raw, true_mask > 0).sum())
    union_r = float(np.logical_or(raw, true_mask > 0).sum())
    assert inter_r / union_r < inter / union


def test_mask_propagation_consistency():
    """Propagating a frame's object mask to the next orbit view through
    the known poses must land on the next view's true silhouette (the
    native stand-in for AOT tracking, seg_gs.py:141-160)."""
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera, retarget
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.pipelines.seg_masks import propagate_mask
    from multiview_inpaint_tpu.utils.synthetic import make_gt_gaussians

    h, w = 48, 64
    fovx, fovy = 0.9, 0.7
    obj = make_gt_gaussians(n=12, seed=2, spread=0.15)
    center = np.asarray(obj.xyz)[:12].mean(axis=0)
    cam0 = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=fovx, fovy=fovy, width=w, height=h)
    th = np.radians(12.0)
    ry = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    rot = np.eye(4)
    rot[:3, :3] = ry
    rot[:3, 3] = center - ry @ center     # rotate about the object
    c2w1 = rot @ cam0.camera_to_world
    cam1 = retarget(cam0, c2w1)

    bgc = jnp.zeros(3)
    outs = []
    for cam in (cam0, cam1):
        o = render(obj, RenderCamera.from_camera(cam), bgc,
                   max_per_tile=256, pair_budget=8 * obj.capacity)
        outs.append((np.asarray(o.alpha) > 0.5).astype(np.float32))
    m0, m1 = outs
    assert m0.sum() > 40 and m1.sum() > 40

    k_mat = np.array([[0.5 * w / np.tan(fovx / 2), 0, w / 2],
                      [0, 0.5 * h / np.tan(fovy / 2), h / 2],
                      [0, 0, 1.0]])
    prop = propagate_mask(m0, cam0.camera_to_world, c2w1, k_mat, center)
    inter = float(np.logical_and(prop > 0.5, m1 > 0.5).sum())
    union = float(np.logical_or(prop > 0.5, m1 > 0.5).sum())
    assert inter / union > 0.6, f"IoU {inter / union:.2f}"


def test_demo_app_server(tmp_path):
    """Browser demo (reference streamlit/gradio apps): start the stdlib
    HTTP server with the tiny model, drive the full request loop —
    health, the HTML page, and POST an image -> sampled GIF bytes."""
    import threading
    import urllib.request

    from PIL import Image as PILImage

    from multiview_inpaint_tpu.pipelines import demo_app

    args = demo_app.build_parser().parse_args(
        ["--port", "0", "--tiny_model", "--size", "64", "64",
         "--num_steps", "2", "--num_frames", "2"])
    srv = demo_app.make_server(args)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = json.loads(urllib.request.urlopen(
            base + "/health", timeout=30).read())
        assert health["ok"] and health["model"] == "tiny"
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"Image" in page and b"/generate" in page

        img_path = tmp_path / "in.png"
        PILImage.fromarray(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), np.uint8)).save(img_path)
        req = urllib.request.Request(
            base + "/generate?num_steps=2&num_frames=2&seed=1",
            data=img_path.read_bytes(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            gif = r.read()
        assert r.status == 200 and gif[:6] in (b"GIF87a", b"GIF89a")

        # bad request: empty body -> 400, not a crash
        req = urllib.request.Request(base + "/generate", data=b"",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_svd_test_cli_shard_frames(ws2, tmp_path, capsys):
    """--shard_frames: frames sharded over the virtual mesh (3 frames
    -> 3 devices) must reproduce the plain run's outputs."""
    data_root = os.path.join(ws2["root"], "inpaint")
    assert os.path.isdir(os.path.join(data_root, "depth", "toy_case")), \
        "run after test_gen_depth_cli (module chain)"
    ctrl_dir = os.path.join(data_root, "ctrl1", "toy_case")
    os.makedirs(ctrl_dir, exist_ok=True)
    if not os.path.exists(os.path.join(ctrl_dir, "ctrl_0.png")):
        shutil.copy(os.path.join(data_root, "seq", "toy_case", "x1",
                                 f"ours_{IT}", "renders", "00.png"),
                    os.path.join(ctrl_dir, "ctrl_0.png"))
    outs = {}
    for tag, extra in (("plain", []), ("sp", ["--shard_frames"])):
        out = os.path.join(str(tmp_path), f"inp_{tag}")
        svd_test.main([
            "--data_root", data_root,
            "--logdir", os.path.join(str(tmp_path), f"logs_{tag}"),
            "--out", out, "--tiny_model", "--num_frames", str(FRAMES),
            "--num_steps", "2", "--size", str(SIZE[0]), str(SIZE[1]),
            "--iteration", str(IT), "--modes", "x1"] + extra)
        outs[tag] = out
    assert "sequence-parallel sampling: 3 frames over 3 devices" in \
        capsys.readouterr().out
    d_a = os.path.join(outs["plain"], "toy_case", "ctrl_0", "x1")
    d_b = os.path.join(outs["sp"], "toy_case", "ctrl_0", "x1")
    for f in sorted(os.listdir(d_a)):
        a = scene_io.load_image(os.path.join(d_a, f))
        b = scene_io.load_image(os.path.join(d_b, f))
        # same keys/sigmas; GSPMD repartitioning shifts f32 rounding
        np.testing.assert_allclose(a, b, atol=2e-2)
        assert np.mean(np.abs(a - b)) < 2e-3
