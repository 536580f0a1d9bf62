"""End-to-end pipeline CLI smoke tests on a synthetic COLMAP scene."""

import json
import os

import numpy as np
import pytest

import fixtures
from multiview_inpaint_tpu.pipelines import (delete, gen_pc, gen_seq,
                                             render as render_cli,
                                             render_depth, train_gs)
from multiview_inpaint_tpu.config.registries import FRONT_VIEWS
from multiview_inpaint_tpu.gs import gaussians


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    src = str(root / "dataset" / "toy")
    fixtures.make_colmap_scene(src)
    model = str(root / "output" / "toy")
    # train briefly
    train_gs.main([
        "-s", src, "-m", model, "--resolution", "1",
        "--iterations", "60", "--densify_from_iter", "20",
        "--densify_until_iter", "50", "--densification_interval", "20",
        "--opacity_reset_interval", "100000",
        "--test_iterations", "60", "--save_iterations", "60",
        "--checkpoint_iterations", "60",
        "--max_per_tile", "256", "--log_interval", "20",
    ])
    FRONT_VIEWS["toy"] = "view00"
    yield {"root": str(root), "src": src, "model": model}
    FRONT_VIEWS.pop("toy", None)


def test_train_outputs(workspace):
    model = workspace["model"]
    ply = os.path.join(model, "point_cloud", "iteration_60",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    p = gaussians.load_ply(ply, 0)
    assert int(p.num_live()) > 0
    assert os.path.exists(os.path.join(model, "chkpnt60.npz"))
    log = [json.loads(l) for l in
           open(os.path.join(model, "train_log.jsonl"))]
    losses = [r["loss"] for r in log if "loss" in r]
    assert losses[-1] < losses[0]
    assert any("psnr" in r for r in log)


def test_train_resume(workspace):
    model = workspace["model"]
    train_gs.main([
        "-s", workspace["src"], "-m", model, "--resolution", "1",
        "--iterations", "70", "--densify_from_iter", "100000",
        "--start_checkpoint", os.path.join(model, "chkpnt60.npz"),
        "--test_iterations", "-1", "--save_iterations", "70",
        "--max_per_tile", "256",
    ])
    assert os.path.exists(os.path.join(model, "point_cloud",
                                       "iteration_70", "point_cloud.ply"))


def test_render_cli(workspace):
    render_cli.main(["-s", workspace["src"], "-m", workspace["model"],
                     "--resolution", "1", "--iteration", "60",
                     "--max_per_tile", "256"])
    rdir = os.path.join(workspace["model"], "train", "ours_60", "renders")
    files = os.listdir(rdir)
    assert len(files) == 6
    from multiview_inpaint_tpu.gs import scene_io
    img = scene_io.load_image(os.path.join(rdir, files[0]))
    gt = scene_io.load_image(os.path.join(
        workspace["model"], "train", "ours_60", "gt", files[0]))
    assert np.abs(img - gt).mean() < 0.2  # smoke: 60 iters, roughly close


def test_gen_pc_cli(workspace):
    gen_pc.main(["-m", workspace["model"], "--iteration", "60"])
    from multiview_inpaint_tpu.gs import ply_io
    pts, cols, _ = ply_io.fetch_point_cloud(
        os.path.join(workspace["model"], "xyz.ply"))
    assert len(pts) > 0


def test_delete_cli(workspace, tmp_path):
    box_path = str(tmp_path / "del_toy.obj")
    fixtures.write_cube_obj(box_path, center=(0, 0, 0), half=0.4)
    before = gaussians.load_ply(
        os.path.join(workspace["model"], "point_cloud", "iteration_60",
                     "point_cloud.ply"), 0)
    delete.main(["-m", workspace["model"], "--box", box_path,
                 "--iteration", "60"])
    after_path = os.path.join(workspace["model"], "point_cloud", "del",
                              "point_cloud.ply")
    after = gaussians.load_ply(after_path, 0)
    assert 0 < after.capacity < before.capacity
    # no remaining point is inside the box
    import jax.numpy as jnp
    from multiview_inpaint_tpu.gs import obb
    box = obb.load_obb(box_path)
    assert not np.any(np.asarray(obb.contains(box, jnp.asarray(
        np.asarray(after.xyz)))))


def test_gen_seq_cli(workspace, tmp_path):
    ws_root = workspace["root"]
    box_path = os.path.join(ws_root, "bds", "add", "toy_case.obj")
    fixtures.write_cube_obj(box_path, center=(0.2, 0.1, 0), half=0.3)
    gen_seq.main(["-s", workspace["src"], "-m", workspace["model"],
                  "--scene_id", "toy_case", "--resolution", "1",
                  "--iteration", "60", "--workspace", ws_root,
                  "--frames", "4", "--max_per_tile", "256",
                  "--allow_default_orbit"])
    for mode in ("x1", "x2"):
        d = os.path.join(ws_root, "inpaint", "seq", "toy_case", mode,
                         "ours_60")
        assert len(os.listdir(os.path.join(d, "renders"))) == 4
        assert len(os.listdir(os.path.join(d, "mask"))) == 4
        poses = np.load(os.path.join(d, "poses.npy"))
        assert poses.shape == (4, 4, 4)
        center = np.load(os.path.join(d, "cam_center.npy"))
        np.testing.assert_allclose(center[0], [0.2, 0.1, 0], atol=1e-5)
        # masks nonempty somewhere in the sequence
        from multiview_inpaint_tpu.gs import scene_io
        total = sum(scene_io.load_image(
            os.path.join(d, "mask", f), grayscale=True).sum()
            for f in os.listdir(os.path.join(d, "mask")))
        assert total > 0
    # bds_train masks for the 6 original views
    bt = os.path.join(ws_root, "inpaint", "seq", "toy_case", "bds_train",
                      "ours_60")
    assert len(os.listdir(os.path.join(bt, "mask"))) == 6


def test_render_depth_cli(workspace):
    ws_root = workspace["root"]
    render_depth.main(["-s", workspace["src"], "-m", workspace["model"],
                       "--scene_id", "toy_case", "--resolution", "1",
                       "--iteration", "60", "--workspace", ws_root,
                       "--frames", "2", "--modes", "x1",
                       "--allow_default_orbit"])
    d = os.path.join(ws_root, "inpaint", "seq", "toy_case", "x1",
                     "ours_60", "disp")
    assert len(os.listdir(d)) == 2


def test_adaptive_pair_budget_growth(workspace, tmp_path, capsys):
    """Forcing a 1x-capacity budget must trigger the doubling schedule
    (train_gs re-jits with a bigger pair_budget_mult and echoes it)."""
    model = str(tmp_path / "toy_pb")
    train_gs.main([
        "-s", workspace["src"], "-m", model, "--resolution", "1",
        "--iterations", "4", "--densify_from_iter", "100",
        "--densify_until_iter", "0", "--opacity_reset_interval", "100000",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--max_per_tile", "256", "--log_interval", "1",
        "--pair_budget_mult", "1",
    ])
    rows = [json.loads(l) for l in
            open(os.path.join(model, "train_log.jsonl"))]
    pairs = [r["pairs"] for r in rows if "pairs" in r]
    assert pairs and all(p > 0 for p in pairs)
    # the toy scene's ~650 pairs exceed 0.85 * 1 * 300 capacity -> growth
    assert "pair budget ->" in capsys.readouterr().out


def test_gen_seq_cli_shard_views(workspace, tmp_path):
    """--shard_views: orbit views sharded over the 8 virtual devices
    must produce byte-identical renders/masks to the sequential run."""
    ws_root = workspace["root"]
    box_path = os.path.join(ws_root, "bds", "add", "toy_case.obj")
    fixtures.write_cube_obj(box_path, center=(0.2, 0.1, 0), half=0.3)
    base = ["-s", workspace["src"], "-m", workspace["model"],
            "--scene_id", "toy_case", "--resolution", "1",
            "--iteration", "60", "--frames", "4",
            "--max_per_tile", "256", "--allow_default_orbit",
            "--modes", "x1"]
    ws_seq = os.path.join(str(tmp_path), "seq_ws")
    ws_shard = os.path.join(str(tmp_path), "shard_ws")
    for w in (ws_seq, ws_shard):
        os.makedirs(os.path.join(w, "bds", "add"), exist_ok=True)
        fixtures.write_cube_obj(
            os.path.join(w, "bds", "add", "toy_case.obj"),
            center=(0.2, 0.1, 0), half=0.3)
    gen_seq.main(base + ["--workspace", ws_seq])
    gen_seq.main(base + ["--workspace", ws_shard, "--shard_views"])
    from multiview_inpaint_tpu.gs import scene_io
    for sub in ("renders", "mask"):
        d_a = os.path.join(ws_seq, "inpaint", "seq", "toy_case", "x1",
                           "ours_60", sub)
        d_b = os.path.join(ws_shard, "inpaint", "seq", "toy_case", "x1",
                           "ours_60", sub)
        names = sorted(os.listdir(d_a))
        assert names == sorted(os.listdir(d_b)) and len(names) == 4
        for f in names:
            a = scene_io.load_image(os.path.join(d_a, f))
            b = scene_io.load_image(os.path.join(d_b, f))
            np.testing.assert_array_equal(a, b)


def test_render_cli_shard_views(workspace):
    """render --shard_views (6 train views over the 8 virtual devices,
    in mesh-size groups) must write byte-identical renders to the
    sequential run. (Both runs target the same model dir — the stored
    cfg pins model_path — so the sequential bytes are snapshotted
    between runs.)"""
    base = ["-s", workspace["src"], "-m", workspace["model"],
            "--resolution", "1", "--iteration", "60",
            "--max_per_tile", "256"]
    rdir = os.path.join(workspace["model"], "train", "ours_60",
                        "renders")
    render_cli.main(base)
    names = sorted(os.listdir(rdir))
    assert len(names) == 6
    seq_bytes = {f: open(os.path.join(rdir, f), "rb").read()
                 for f in names}
    for f in names:
        os.remove(os.path.join(rdir, f))
    render_cli.main(base + ["--shard_views"])
    assert sorted(os.listdir(rdir)) == names
    for f in names:
        assert open(os.path.join(rdir, f), "rb").read() == seq_bytes[f]


def test_render_depth_cli_shard_views(workspace, tmp_path):
    """render_depth --shard_views writes byte-identical disparity maps
    to the sequential run (separate workspaces)."""
    import shutil

    base = ["-s", workspace["src"], "-m", workspace["model"],
            "--scene_id", "toy_case", "--resolution", "1",
            "--iteration", "60", "--frames", "4",
            "--allow_default_orbit", "--modes", "x1"]
    dirs = {}
    for tag, extra in (("seq", []), ("shard", ["--shard_views"])):
        ws = os.path.join(str(tmp_path), f"{tag}_ws")
        os.makedirs(os.path.join(ws, "bds", "add"), exist_ok=True)
        fixtures.write_cube_obj(
            os.path.join(ws, "bds", "add", "toy_case.obj"),
            center=(0.2, 0.1, 0), half=0.3)
        render_depth.main(base + ["--workspace", ws] + extra)
        dirs[tag] = os.path.join(ws, "inpaint", "seq", "toy_case", "x1",
                                 "ours_60", "disp")
    names = sorted(os.listdir(dirs["seq"]))
    assert names == sorted(os.listdir(dirs["shard"])) and len(names) == 4
    for f in names:
        a = open(os.path.join(dirs["seq"], f), "rb").read()
        b = open(os.path.join(dirs["shard"], f), "rb").read()
        assert a == b
