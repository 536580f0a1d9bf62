"""Rasterizer tests: analytic single-splat checks, tiled==oracle, grads."""

import functools
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.gs import gaussians, cameras
from multiview_inpaint_tpu.ops import rasterizer
from multiview_inpaint_tpu.ops.rasterizer import RenderCamera
from multiview_inpaint_tpu.utils import sh as sh_utils
from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid


def _isolated(test_fn):
    """Run the test in a CLEAN SUBPROCESS when invoked from a larger
    session. XLA:CPU's in-process JIT has segfaulted inside
    ``backend_compile_and_load`` compiling this file's heaviest
    interpret-mode graphs AFTER ~100 other tests' executables loaded
    (full-suite runs crashed deterministically at such a compile;
    fresh-process runs of the same tests always pass). The outer
    invocation re-runs the test isolated; the inner one executes the
    body.

    Upstream-bug tracking note (so this workaround can be removed when
    fixed): jax 0.9.x / jaxlib XLA:CPU, Linux x86-64, 1 core. Crash
    repro = run the FULL tests/ suite in one process with
    ``jax_platforms=cpu``; SIGSEGV lands in
    ``xla::cpu::CpuCompiler``'s ``backend_compile_and_load`` while
    compiling an interpret-mode pallas graph from this file after
    ~100 prior test executables have loaded (address layout /
    code-cache pressure dependent — never reproduces in a fresh
    process, so a minimal single-graph repro does not exist; the
    trigger is the accumulated session). Re-check by dropping
    ``_isolated`` from one heavy test and running the full suite.
    ``-p no:cacheprovider`` stops the nested pytest from contending
    over .pytest_cache with the outer session."""
    @functools.wraps(test_fn)
    def wrapper():
        if os.environ.get("_RAST_ISOLATED"):
            return test_fn()
        env = dict(os.environ, _RAST_ISOLATED="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             "-p", "no:cacheprovider",
             f"{__file__}::{test_fn.__name__}"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (r.stdout[-3000:] + r.stderr[-2000:])
    return wrapper


def _make_params(xyz, rgb, opacity, scale, capacity=None):
    n = len(xyz)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    return gaussians.from_arrays(
        np.asarray(xyz, np.float32),
        dc.astype(np.float32),
        np.zeros((n, 0, 3), np.float32),
        np.asarray(inverse_sigmoid(jnp.asarray(opacity))).reshape(n, 1),
        np.log(np.asarray(scale, np.float32)),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=capacity,
    )


def _front_camera(width=64, height=64, z=-4.0):
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0, -z]),
                              fovx=0.8, fovy=0.8, width=width, height=height)
    return RenderCamera.from_camera(cam)


def test_single_gaussian_center():
    p = _make_params([[0.0, 0, 0]], [[1.0, 0, 0]], [[0.999]],
                     [[0.3, 0.3, 0.3]])
    cam = _front_camera()
    out = rasterizer.render(p, cam, jnp.zeros(3), max_per_tile=8,
                            pair_budget=64)
    rgb = np.asarray(out.rgb)
    # Center pixel strongly red; corner is background.
    cy, cx = 31, 31
    assert rgb[cy, cx, 0] > 0.9, rgb[cy, cx]
    assert rgb[cy, cx, 1] < 0.05
    assert rgb[0, 0].max() < 1e-3
    # Depth: center ~ distance 4, corner = empty sentinel 15.
    d = np.asarray(out.depth)
    assert d[cy, cx] == pytest.approx(4.0, abs=0.2)
    assert d[0, 0] == pytest.approx(15.0, abs=1e-3)
    assert bool(out.visibility[0])
    assert int(out.radii[0]) > 0


def test_background_color():
    p = _make_params([[0.0, 0, 0]], [[1.0, 0, 0]], [[0.9]],
                     [[0.05, 0.05, 0.05]])
    cam = _front_camera()
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = rasterizer.render(p, cam, bg, max_per_tile=8, pair_budget=64)
    np.testing.assert_allclose(np.asarray(out.rgb)[0, 0], [0.2, 0.4, 0.6],
                               atol=1e-4)


def test_occlusion_order():
    # red at z=0 (near), blue at z=2 (far), same screen position
    p = _make_params([[0.0, 0, 0], [0.0, 0, 2.0]],
                     [[1.0, 0, 0], [0.0, 0, 1.0]],
                     [[0.999], [0.999]],
                     [[0.3, 0.3, 0.3], [0.3, 0.3, 0.3]])
    cam = _front_camera()
    out = rasterizer.render(p, cam, jnp.zeros(3), max_per_tile=8,
                            pair_budget=128)
    rgb = np.asarray(out.rgb)[31, 31]
    assert rgb[0] > 0.9 and rgb[2] < 0.05, rgb
    # Swap: blue nearer -> blue wins.
    p2 = _make_params([[0.0, 0, 2.0], [0.0, 0, 0.0]],
                      [[1.0, 0, 0], [0.0, 0, 1.0]],
                      [[0.999], [0.999]],
                      [[0.3, 0.3, 0.3], [0.3, 0.3, 0.3]])
    out2 = rasterizer.render(p2, cam, jnp.zeros(3), max_per_tile=8,
                             pair_budget=128)
    rgb2 = np.asarray(out2.rgb)[31, 31]
    assert rgb2[2] > 0.9 and rgb2[0] < 0.05, rgb2


def _random_scene(n=300, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1.5, 1.5, size=(n, 3))
    xyz[:, 2] = rng.uniform(-1.0, 3.0, size=n)
    rgb = rng.random((n, 3))
    op = rng.uniform(0.2, 0.95, size=(n, 1))
    scale = rng.uniform(0.02, 0.15, size=(n, 3))
    return _make_params(xyz, rgb, op, scale, capacity=capacity)


def test_tiled_matches_oracle():
    p = _random_scene(300)
    cam = _front_camera(width=72, height=56)  # non-multiple of tile
    got = rasterizer.render(p, cam, jnp.zeros(3), max_per_tile=512,
                            pair_budget=8 * 300)
    want = rasterizer.render_oracle(p, cam, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.depth),
                               np.asarray(want.depth), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.alpha),
                               np.asarray(want.alpha), atol=2e-5)


def test_padded_dead_rows_invisible():
    p_live = _random_scene(50)
    p_padded = _random_scene(50, capacity=128)
    cam = _front_camera(width=32, height=32)
    a = rasterizer.render(p_live, cam, jnp.zeros(3), max_per_tile=128,
                          pair_budget=1024)
    b = rasterizer.render(p_padded, cam, jnp.zeros(3), max_per_tile=128,
                          pair_budget=1024)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=1e-6)
    assert not np.any(np.asarray(b.visibility)[50:])


def test_gradients_flow():
    p = _random_scene(64)
    cam = _front_camera(width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(params, offset):
        out = rasterizer.render(params, cam, jnp.zeros(3),
                                means2d_offset=offset, max_per_tile=256,
                                pair_budget=1024)
        return jnp.mean((out.rgb - target) ** 2)

    offset = jnp.zeros((64, 2))
    (g_params, g_off) = jax.grad(loss_fn, argnums=(0, 1),
                                 allow_int=True)(p, offset)
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        g = np.asarray(getattr(g_params, name))
        assert np.all(np.isfinite(g)), name
        assert np.abs(g).max() > 0, f"zero grad for {name}"
    g_off = np.asarray(g_off)
    assert np.all(np.isfinite(g_off))
    # visible gaussians get a screen-space gradient signal
    vis = np.asarray(rasterizer.render(p, cam, jnp.zeros(3),
                                       max_per_tile=256,
                                       pair_budget=1024).visibility)
    assert np.abs(g_off[vis]).sum() > 0


def test_gradient_matches_finite_difference():
    # Move one gaussian's opacity; check dLoss/dopacity vs finite diff.
    p = _make_params([[0.0, 0, 0]], [[0.8, 0.3, 0.2]], [[0.6]],
                     [[0.25, 0.25, 0.25]])
    cam = _front_camera(width=32, height=32)

    def loss_fn(op_raw):
        q = dataclasses_replace(p, opacity=op_raw)
        out = rasterizer.render(q, cam, jnp.zeros(3), max_per_tile=8,
                                pair_budget=64)
        return jnp.sum(out.rgb)

    import dataclasses
    def dataclasses_replace(obj, **kw):
        return dataclasses.replace(obj, **kw)

    g = jax.grad(loss_fn)(p.opacity)
    eps = 1e-3
    up = loss_fn(p.opacity + eps)
    dn = loss_fn(p.opacity - eps)
    fd = (up - dn) / (2 * eps)
    assert float(g[0, 0]) == pytest.approx(float(fd), rel=2e-2)


def test_overflow_reporting():
    from multiview_inpaint_tpu.ops.rasterizer import binning
    # 10 gaussians x 4 tiles each = 40 pairs, budget 16 -> overflow visible.
    means2d = jnp.tile(jnp.asarray([[15.9, 15.9]]), (10, 1))
    radius = jnp.full((10,), 5, jnp.int32)
    depth = jnp.arange(10, dtype=jnp.float32)
    bins = binning.bin_gaussians(means2d, radius, depth, tiles_x=2,
                                 tiles_y=2, tile_w=16, tile_h=16,
                                 pair_budget=16, max_per_tile=8)
    assert int(bins.total_pairs) == 40  # true count reported
    # depth ordering within a tile
    ids0 = np.asarray(bins.ids[0][np.asarray(bins.valid[0])])
    assert list(ids0) == sorted(ids0)


def test_pallas_interpret_matches_xla():
    """The fused kernel (interpret mode) must track the XLA path."""
    p = _random_scene(250, seed=9)
    cam = _front_camera(width=80, height=64)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    a = rasterizer.render(p, cam, bg, max_per_tile=512,
                          pair_budget=8 * p.capacity)
    b = rasterizer.render(p, cam, bg, pair_budget=8 * p.capacity,
                          backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=3e-4)


def test_pallas_8x16_tiles_match_xla():
    """The PIX=128 tile shape (round-3 perf lever) must render the same
    image and gradients as the XLA path (which bins at its own tiling —
    the composited image is tiling-invariant)."""
    p = _random_scene(200, seed=11)
    cam = _front_camera(width=80, height=64)
    bg = jnp.asarray([0.3, 0.1, 0.2])
    a = rasterizer.render(p, cam, bg, max_per_tile=512,
                          pair_budget=8 * p.capacity)
    b = rasterizer.render(p, cam, bg, pair_budget=8 * p.capacity,
                          backend="pallas", tile=(8, 16), interpret=True)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=3e-4)

    target = jnp.asarray(
        np.random.default_rng(1).random((64, 80, 3)), jnp.float32)

    def loss(params, **kw):
        out = rasterizer.render(params, cam, bg, max_per_tile=512,
                                pair_budget=8 * params.capacity, **kw)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.alpha))

    g_xla = jax.grad(loss, allow_int=True)(p)
    g_pal = jax.grad(lambda q: loss(q, backend="pallas", tile=(8, 16),
                                    interpret=True), allow_int=True)(p)
    for f in ("xyz", "features_dc", "opacity", "scaling"):
        a_ = np.asarray(getattr(g_xla, f))
        b_ = np.asarray(getattr(g_pal, f))
        np.testing.assert_allclose(
            b_, a_, atol=2e-6 + 1e-4 * np.abs(a_).max(), err_msg=f)


def test_render_sh_degree3_view_dependence():
    """Degree-3 SH colors vary with viewing direction."""
    n = 1
    rng = np.random.default_rng(4)
    dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    rest = rng.normal(scale=1.0, size=(n, 15, 3)).astype(np.float32)
    p = gaussians.from_arrays(
        np.zeros((n, 3), np.float32), dc, rest,
        np.asarray(inverse_sigmoid(jnp.full((n, 1), 0.99))),
        np.log(np.full((n, 3), 0.3, np.float32)),
        np.array([[1, 0, 0, 0]], np.float32))
    bg = jnp.zeros(3)
    cam_front = _front_camera(width=32, height=32, z=-3.0)
    cam_side = RenderCamera.from_camera(cameras.make_camera(
        0, np.array([[0, 0, -1.0], [0, 1, 0], [1, 0, 0]]).T,
        np.array([0.0, 0, 3.0]), fovx=0.8, fovy=0.8, width=32, height=32))
    c1 = rasterizer.render(p, cam_front, bg, sh_degree=3, max_per_tile=8,
                           pair_budget=64).rgb[16, 16]
    c2 = rasterizer.render(p, cam_side, bg, sh_degree=3, max_per_tile=8,
                           pair_budget=64).rgb[16, 16]
    c0 = rasterizer.render(p, cam_front, bg, sh_degree=0, max_per_tile=8,
                           pair_budget=64).rgb[16, 16]
    assert float(jnp.abs(c1 - c2).max()) > 1e-3  # view-dependent
    assert float(jnp.abs(c1 - c0).max()) > 1e-3  # higher orders used


def test_pallas_backward_matches_xla_grads():
    """Custom-VJP pallas backward vs XLA autodiff (interpret mode)."""
    p = _random_scene(120, seed=3)
    cam = _front_camera(width=48, height=32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.asarray(
        np.random.default_rng(0).random((32, 48, 3)), jnp.float32)

    def loss(params, backend, interpret=False):
        out = rasterizer.render(params, cam, bg, max_per_tile=512,
                                pair_budget=8 * params.capacity,
                                backend=backend, interpret=interpret)
        return (jnp.mean((out.rgb - target) ** 2)
                + 0.1 * jnp.mean(out.depth) + 0.05 * jnp.mean(out.alpha))

    g_xla = jax.grad(lambda q: loss(q, "xla"), allow_int=True)(p)
    g_pal = jax.grad(lambda q: loss(q, "pallas", True), allow_int=True)(p)
    for f in ("xyz", "features_dc", "opacity", "scaling"):
        a = np.asarray(getattr(g_xla, f))
        b = np.asarray(getattr(g_pal, f))
        np.testing.assert_allclose(b, a, atol=2e-6 + 1e-4 * np.abs(a).max(),
                                   err_msg=f)


def test_render_views_matches_individual():
    rng = np.random.default_rng(5)
    n = 40
    p = _make_params(rng.normal(0, 0.6, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.9, (n, 1)),
                     rng.uniform(0.05, 0.2, (n, 3)))
    cams = [cameras.make_camera(i, np.eye(3),
                                np.array([0.1 * i, 0.0, 4.0 + 0.2 * i]),
                                fovx=0.8, fovy=0.8, width=64, height=48)
            for i in range(3)]
    bg = jnp.zeros(3)
    outs = rasterizer.render_views(p, cams, bg, max_per_tile=64,
                                   pair_budget=8 * n)
    assert outs.rgb.shape == (3, 48, 64, 3)
    for i, c in enumerate(cams):
        one = rasterizer.render(p, RenderCamera.from_camera(c), bg,
                                max_per_tile=64, pair_budget=8 * n)
        np.testing.assert_allclose(np.asarray(outs.rgb[i]),
                                   np.asarray(one.rgb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs.depth[i]),
                                   np.asarray(one.depth), atol=1e-5)


def test_projection_matches_ewa_oracle():
    """The scalarized projection must match the textbook EWA chain
    J W Sigma W^T J^T (the reference's computeCov2D) computed in numpy."""
    import numpy as np

    from multiview_inpaint_tpu.ops.rasterizer import geometry
    from multiview_inpaint_tpu.utils.quaternion import (
        covariance_from_scaling_rotation)

    rng = np.random.default_rng(7)
    n = 64
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] += 4.0
    scaling = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.9, n).astype(np.float32)
    feat = rng.normal(size=(n, 1, 3)).astype(np.float32)
    wv = np.eye(4, dtype=np.float32)
    wv[:3, 3] = [0.1, -0.2, 0.3]
    tan_fovx, tan_fovy, width, height = 0.8, 0.6, 160, 120
    # full projection matrix (any [4,4] works for the mean check)
    proj = np.diag([1 / tan_fovx, 1 / tan_fovy, 1.001, 0]).astype(
        np.float32)
    proj[3, 2] = 1.0
    full = proj @ wv

    out = geometry.project_gaussians(
        jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(opacity),
        jnp.asarray(scaling), jnp.asarray(q),
        jnp.ones((n,), bool), jnp.asarray(wv), jnp.asarray(full),
        jnp.zeros(3), tan_fovx, tan_fovy, width, height, 0)

    # numpy oracle of the original matrix chain
    t = xyz @ wv[:3, :3].T + wv[:3, 3]
    tz = t[:, 2]
    cov3d = np.asarray(covariance_from_scaling_rotation(
        jnp.asarray(scaling), jnp.asarray(q)))
    fx, fy = width / (2 * tan_fovx), height / (2 * tan_fovy)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txz = np.clip(t[:, 0] / tz, -limx, limx) * tz
    tyz = np.clip(t[:, 1] / tz, -limy, limy) * tz
    conic_ref = np.zeros((n, 3))
    for i in range(n):
        J = np.array([[fx / tz[i], 0, -fx * txz[i] / tz[i] ** 2],
                      [0, fy / tz[i], -fy * tyz[i] / tz[i] ** 2]])
        M = J @ wv[:3, :3]
        c2 = M @ cov3d[i] @ M.T
        a, b, c = c2[0, 0] + 0.3, c2[0, 1], c2[1, 1] + 0.3
        det = a * c - b * b
        conic_ref[i] = [c / det, -b / det, a / det]
    np.testing.assert_allclose(np.asarray(out.conic), conic_ref,
                               rtol=5e-3, atol=5e-4)


def test_expand_kernel_matches_xla_expansion():
    """The Pallas pair-expansion kernel (compact-rank keys) must produce
    the same per-tile pair streams as the XLA delta-scatter telescoping
    (depth-rank keys) once both are mapped back to original ids."""
    import numpy as np

    from multiview_inpaint_tpu.ops.rasterizer import binning

    rng = np.random.default_rng(3)
    n = 300
    means2d = jnp.asarray(rng.uniform(-10, 70, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.integers(0, 9, n), jnp.int32)  # some culled
    depth = jnp.asarray(rng.uniform(0.5, 9.0, n), jnp.float32)
    kw = dict(tiles_x=4, tiles_y=3, tile_w=16, tile_h=16,
              pair_budget=2048, max_per_tile=64, gather_ids=False,
              aligned_chunk=128)
    a = binning.bin_gaussians(means2d, radius, depth, **kw)
    b = binning.bin_gaussians(means2d, radius, depth, **kw,
                              expand_kernel=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.counts),
                                  np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.seg_start),
                                  np.asarray(b.seg_start))
    assert int(a.total_pairs) == int(b.total_pairs) > 0

    def mapped(bins):
        g = np.asarray(bins.gid_sorted)
        o = np.asarray(bins.order)
        return np.where(g == n, n, o[np.clip(g, 0, n - 1)])

    np.testing.assert_array_equal(mapped(a), mapped(b))


def test_expand_window_adaptive():
    """A tight expansion window reproduces the worst-case keys exactly,
    and the returned ``needed`` detects too-small windows (the adaptive
    grow-and-re-jit contract, like pair-budget overflow)."""
    import numpy as np

    from multiview_inpaint_tpu.ops.rasterizer import binning

    rng = np.random.default_rng(5)
    n = 400
    means2d = jnp.asarray(rng.uniform(-10, 70, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.integers(0, 9, n), jnp.int32)
    depth = jnp.asarray(rng.uniform(0.5, 9.0, n), jnp.float32)
    kw = dict(tiles_x=4, tiles_y=3, tile_w=16, tile_h=16,
              pair_budget=2048, max_per_tile=64, gather_ids=False,
              aligned_chunk=128, expand_kernel=True, interpret=True)
    a = binning.bin_gaussians(means2d, radius, depth, **kw)
    need = int(a.expand_needed)
    assert 0 < need <= 288
    tight = max(-(-need // 16) * 16, 16)
    b = binning.bin_gaussians(means2d, radius, depth, **kw,
                              expand_window=tight)
    assert int(b.expand_needed) == need <= tight
    np.testing.assert_array_equal(np.asarray(a.gid_sorted),
                                  np.asarray(b.gid_sorted))
    np.testing.assert_array_equal(np.asarray(a.counts),
                                  np.asarray(b.counts))
    if need > 32:  # a provably too-small window must be detectable
        c = binning.bin_gaussians(means2d, radius, depth, **kw,
                                  expand_window=16)
        assert int(c.expand_needed) > 16


def test_expand_keys_block_boundary_exactness():
    """Direct adversarial test of pair_expand.expand_keys against a
    numpy reference, with segment starts landing EXACTLY on 256-slot
    block boundaries (and one off either side): g_first[b] is now an
    MXU-histogram cumsum (#{g: start <= b*B} - 1) and an off-by-one
    there corrupts every key in a block."""
    from multiview_inpaint_tpu.ops.rasterizer import pair_expand

    B = pair_expand.B
    tiles_x = 8
    # counts engineered so starts hit {B, 2B, 3B-1, 3B, 3B+1, ...}
    counts = [B, B, B - 1, 1, 1, B - 1, 37, 91, 128, 256, 64]
    n_active = len(counts)
    n = n_active + 5  # trailing inactive (count-0) rows
    starts_np = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(np.sum(counts))
    rng = np.random.default_rng(7)
    x0 = np.zeros(n, np.int32)
    y0 = np.zeros(n, np.int32)
    w = np.ones(n, np.int32)
    x0[:n_active] = rng.integers(0, 4, n_active)
    y0[:n_active] = rng.integers(0, 3, n_active)
    w[:n_active] = rng.integers(1, 5, n_active)
    active = np.arange(n) < n_active
    starts = np.zeros(n, np.int32)
    starts[:n_active] = starts_np
    gid_bits = max(1, n.bit_length())
    pair_budget = -(-total // 128) * 128 + 128

    keys, needed = pair_expand.expand_keys(
        jnp.asarray(starts, jnp.int32), jnp.asarray(x0),
        jnp.asarray(y0), jnp.asarray(w), jnp.asarray(active),
        jnp.int32(total), n, gid_bits, tiles_x, pair_budget,
        interpret=True)
    keys = np.asarray(keys)

    # numpy reference: owner of slot j = last active g with start <= j.
    ref = np.full(pair_budget, 2**31 - 1, np.int64)
    for j in range(total):
        g = int(np.searchsorted(starts_np, j, side="right")) - 1
        q, r = divmod(j - starts_np[g], w[g])
        tile = (y0[g] + q) * tiles_x + (x0[g] + r)
        ref[j] = (int(tile) << gid_bits) | g
    np.testing.assert_array_equal(keys.astype(np.int64), ref)

    # the tight window reproduces identical keys
    tight = max(-(-int(needed) // 16) * 16, 16)
    keys2, needed2 = pair_expand.expand_keys(
        jnp.asarray(starts, jnp.int32), jnp.asarray(x0),
        jnp.asarray(y0), jnp.asarray(w), jnp.asarray(active),
        jnp.int32(total), n, gid_bits, tiles_x, pair_budget,
        window=tight, interpret=True)
    assert int(needed2) == int(needed) <= tight
    np.testing.assert_array_equal(np.asarray(keys2), keys)


def test_render_views_sharded_matches_sequential():
    """Orbit rendering sharded over the virtual 8-device mesh (views on
    the data axis, params replicated) must match the single-device
    per-view loop — including the pad-and-discard path (5 views on 8
    devices)."""
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.render_parallel import (
        render_views_sharded)

    rng = np.random.default_rng(11)
    n = 40
    p = _make_params(rng.normal(0, 0.6, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.9, (n, 1)),
                     rng.uniform(0.05, 0.2, (n, 3)))
    cams = [cameras.make_camera(i, np.eye(3),
                                np.array([0.1 * i, 0.0, 4.0 + 0.2 * i]),
                                fovx=0.8, fovy=0.8, width=64, height=48)
            for i in range(5)]
    bg = jnp.asarray([0.2, 0.1, 0.4])
    kw = dict(max_per_tile=64, pair_budget=8 * n)
    seq = rasterizer.render_views(p, cams, bg, **kw)
    mesh = make_mesh(8)
    out = render_views_sharded(p, cams, bg, mesh, **kw)
    assert out.rgb.shape == (5, 48, 64, 3)
    np.testing.assert_allclose(np.asarray(out.rgb),
                               np.asarray(seq.rgb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(seq.depth), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.pairs),
                                  np.asarray(seq.pairs))


def test_band_render_matches_full_frame_slices():
    """Band mode (band_rows/band_row0) must reproduce the corresponding
    full-frame rows: BIT-identically on the xla backend (rects intersect
    the band in integer tile space; the composite gets global pixel
    coords), and to ≲2e-6 on pallas (identical coverage and order, but
    band-local segment offsets regroup chunks at different 128-lane
    boundaries — f32 accumulation order shifts). Height 56 exercises
    the sub-tile bottom crop (the last band keeps its padding rows)."""
    rng = np.random.default_rng(7)
    n = 80
    p = _make_params(rng.normal(0, 0.7, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.95, (n, 1)),
                     rng.uniform(0.05, 0.25, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=0.8, width=64, height=56)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity)
    for backend, interp in (("xla", False), ("pallas", True)):
        full = rasterizer.render(p, rc, bg, backend=backend,
                                 interpret=interp, **kw)
        for r0, rows in ((0, 2), (1, 2), (2, 2), (3, 1)):
            band = rasterizer.render(p, rc, bg, backend=backend,
                                     interpret=interp, band_rows=rows,
                                     band_row0=jnp.int32(r0), **kw)
            lo, hi = r0 * 16, min((r0 + rows) * 16, 56)
            if backend == "xla":
                np.testing.assert_array_equal(
                    np.asarray(band.rgb)[:hi - lo],
                    np.asarray(full.rgb)[lo:hi])
                np.testing.assert_array_equal(
                    np.asarray(band.depth)[:hi - lo],
                    np.asarray(full.depth)[lo:hi])
                np.testing.assert_array_equal(
                    np.asarray(band.alpha)[:hi - lo],
                    np.asarray(full.alpha)[lo:hi])
            else:
                np.testing.assert_allclose(
                    np.asarray(band.rgb)[:hi - lo],
                    np.asarray(full.rgb)[lo:hi], atol=4e-6)
                np.testing.assert_allclose(
                    np.asarray(band.depth)[:hi - lo],
                    np.asarray(full.depth)[lo:hi], atol=4e-5)
                np.testing.assert_allclose(
                    np.asarray(band.alpha)[:hi - lo],
                    np.asarray(full.alpha)[lo:hi], atol=4e-6)


def test_band_render_gradients_match_full_frame():
    """d/dparams of a loss over band pixels == the same loss computed on
    the full frame's matching rows — both backends (pallas backward
    kernel gets the band row offset through the custom VJP)."""
    rng = np.random.default_rng(13)
    n = 40
    p = _make_params(rng.normal(0, 0.6, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.9, (n, 1)),
                     rng.uniform(0.08, 0.2, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.8, fovy=0.8, width=32, height=64)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3)
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity)
    import dataclasses

    r0, rows = 1, 2
    lo, hi = r0 * 16, (r0 + rows) * 16
    tgt = jnp.asarray(rng.random((hi - lo, 32, 3)), jnp.float32)

    for backend, interp in (("xla", False), ("pallas", True)):
        def loss_full(xyz):
            out = rasterizer.render(dataclasses.replace(p, xyz=xyz), rc, bg,
                                    backend=backend, interpret=interp,
                                    **kw)
            return jnp.sum((out.rgb[lo:hi] - tgt) ** 2)

        def loss_band(xyz):
            out = rasterizer.render(dataclasses.replace(p, xyz=xyz), rc, bg,
                                    backend=backend, interpret=interp,
                                    band_rows=rows,
                                    band_row0=jnp.int32(r0), **kw)
            return jnp.sum((out.rgb - tgt) ** 2)

        g_full = jax.grad(loss_full)(p.xyz)
        g_band = jax.grad(loss_band)(p.xyz)
        # pallas band grads carry the same chunk-regrouping noise as its
        # forward (see test above); xla band grads are exact.
        np.testing.assert_allclose(np.asarray(g_band),
                                   np.asarray(g_full),
                                   rtol=2e-4, atol=1e-5)


def test_render_frame_sharded_matches_single_device():
    """One frame's tile rows sharded into bands over the virtual 8-mesh
    must match the single-device render (pixels to XLA recompilation
    noise, pair count exactly)."""
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.render_parallel import (
        render_frame_sharded)

    rng = np.random.default_rng(23)
    n = 60
    p = _make_params(rng.normal(0, 0.7, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.95, (n, 1)),
                     rng.uniform(0.05, 0.25, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=0.8, width=64, height=56)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity)
    full = rasterizer.render(p, rc, bg, **kw)
    sh = render_frame_sharded(p, rc, bg, make_mesh(8), **kw)
    assert sh.rgb.shape == full.rgb.shape == (56, 64, 3)
    np.testing.assert_allclose(np.asarray(sh.rgb), np.asarray(full.rgb),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(sh.depth),
                               np.asarray(full.depth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh.alpha),
                               np.asarray(full.alpha), atol=2e-6)
    assert int(sh.pairs) == int(full.pairs)
    np.testing.assert_array_equal(np.asarray(sh.radii),
                                  np.asarray(full.radii))


def test_interleaved_band_render_matches_full_frame():
    """Stride-D band mode (device d owns tile rows d, d+D, ...) must
    reproduce the full frame's rows — bit-identically on xla, within
    the chunk-regrouping envelope on pallas — and the interleaved
    frame-sharded wrapper must stitch them back exactly."""
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.render_parallel import (
        render_frame_sharded)

    rng = np.random.default_rng(7)
    n = 80
    p = _make_params(rng.normal(0, 0.7, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.95, (n, 1)),
                     rng.uniform(0.05, 0.25, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=0.8, width=64, height=56)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity)
    for backend, interp in (("xla", False), ("pallas", True)):
        full = rasterizer.render(p, rc, bg, backend=backend,
                                 interpret=interp, **kw)
        for d in (0, 1):   # stride 2, offsets 0/1 over 4 tile rows
            band = rasterizer.render(p, rc, bg, backend=backend,
                                     interpret=interp, band_rows=2,
                                     band_row0=jnp.int32(d),
                                     band_stride=2, **kw)
            want = np.concatenate(
                [np.asarray(full.rgb)[(d + 2 * l) * 16:
                                      min((d + 2 * l) * 16 + 16, 56)]
                 for l in range(2)])
            got = np.asarray(band.rgb)[:want.shape[0]]
            if backend == "xla":
                np.testing.assert_array_equal(got, want)
            else:
                np.testing.assert_allclose(got, want, atol=4e-6)

    mesh = make_mesh(8)
    full = rasterizer.render(p, rc, bg, **kw)
    for interleaved in (True, False):
        sh = render_frame_sharded(p, rc, bg, mesh,
                                  interleaved=interleaved, **kw)
        np.testing.assert_allclose(np.asarray(sh.rgb),
                                   np.asarray(full.rgb), atol=2e-6)
        np.testing.assert_allclose(np.asarray(sh.depth),
                                   np.asarray(full.depth), atol=2e-5)
        assert int(sh.pairs) == int(full.pairs)


@_isolated
def test_band_cull_identical_and_overflow_flag():
    """Per-band N-culling (``cull_n``): with capacity >= the band's true
    active count the output is IDENTICAL to the unculled band on BOTH
    backends — the cull only truncates the already-compacted depth-rank
    prefix, so pairs, segment starts and chunk boundaries are unchanged
    — gradients match (exercises the scatter branch of the
    pair_attrs_bf16 VJP), and ``cull_needed`` reports the true active
    count; with capacity below it the overflow flag fires."""
    import dataclasses

    rng = np.random.default_rng(31)
    n = 80
    p = _make_params(rng.normal(0, 0.7, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.95, (n, 1)),
                     rng.uniform(0.05, 0.25, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=1.2, width=64, height=128)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity, band_rows=2,
              band_row0=jnp.int32(1), band_stride=4)
    for backend, interp in (("xla", False), ("pallas", True)):
        base = rasterizer.render(p, rc, bg, backend=backend,
                                 interpret=interp, **kw)
        assert int(base.cull_needed) == 0   # cull off -> no signal
        # cull_n = n-1 engages the cull path and reports the TRUE band
        # active count (it cannot overflow only if act < n; checked).
        probe = rasterizer.render(p, rc, bg, backend=backend,
                                  interpret=interp, cull_n=n - 1, **kw)
        act = int(probe.cull_needed)
        assert 0 < act < n - 1, act   # band must genuinely cull
        # cull_n >= n makes the truncation a no-op but still reports
        # the active count, so a cull_n=n probe can measure it.
        eq = rasterizer.render(p, rc, bg, backend=backend,
                               interpret=interp, cull_n=n, **kw)
        assert int(eq.cull_needed) == act
        culled = rasterizer.render(p, rc, bg, backend=backend,
                                   interpret=interp, cull_n=act + 2, **kw)
        assert int(culled.cull_needed) == act
        np.testing.assert_array_equal(np.asarray(culled.rgb),
                                      np.asarray(base.rgb))
        np.testing.assert_array_equal(np.asarray(culled.depth),
                                      np.asarray(base.depth))
        np.testing.assert_array_equal(np.asarray(culled.alpha),
                                      np.asarray(base.alpha))
        assert int(culled.pairs) == int(base.pairs)
        # Overflow: capacity below the true active count must flag.
        over = rasterizer.render(p, rc, bg, backend=backend,
                                 interpret=interp, cull_n=8, **kw)
        assert int(over.cull_needed) == act > 8

        tgt = jnp.asarray(rng.random((32, 64, 3)), jnp.float32)

        def loss(xyz, cull):
            out = rasterizer.render(dataclasses.replace(p, xyz=xyz), rc,
                                    bg, backend=backend,
                                    interpret=interp, cull_n=cull, **kw)
            return jnp.sum((out.rgb - tgt) ** 2)

        g0 = jax.grad(loss)(p.xyz, None)
        g1 = jax.grad(loss)(p.xyz, act + 2)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-6, atol=1e-7)

    with pytest.raises(ValueError):
        rasterizer.render(p, rc, bg, cull_n=0, **kw)


def test_render_frame_sharded_with_cull():
    """``cull_n`` through the band-sharded wrapper: stitched frame
    matches the full render, worst-band active count reported."""
    from multiview_inpaint_tpu.parallel import make_mesh
    from multiview_inpaint_tpu.parallel.render_parallel import (
        render_frame_sharded)

    rng = np.random.default_rng(29)
    n = 60
    p = _make_params(rng.normal(0, 0.7, (n, 3)),
                     rng.random((n, 3)),
                     rng.uniform(0.3, 0.95, (n, 1)),
                     rng.uniform(0.05, 0.25, (n, 3)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=0.8, width=64, height=56)
    rc = RenderCamera.from_camera(cam)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    kw = dict(max_per_tile=64, pair_budget=8 * p.capacity)
    full = rasterizer.render(p, rc, bg, **kw)
    sh = render_frame_sharded(p, rc, bg, make_mesh(8), cull_n=n - 1, **kw)
    np.testing.assert_allclose(np.asarray(sh.rgb), np.asarray(full.rgb),
                               atol=2e-6)
    assert int(sh.pairs) == int(full.pairs)
    assert 0 < int(sh.cull_needed) < n


@_isolated
def test_wide_keys_bitmatch_packed():
    """Reference-scale key encoding: past N = 2^(31 - tile_bits) the
    packed ``tile << gid_bits | rank`` int32 key overflows and binning
    switches to wide (tile, rank) lexicographic keys. Forced at small N
    the wide path must be BIT-identical to the packed path (within a
    tile, ranks are unique — the sorted pair order is the same), on
    values, metadata, and gradients, in both full-frame and
    interleaved-band modes. Subprocess-isolated (see ``_isolated``)."""
    import dataclasses

    p = _random_scene(280, seed=17)
    cam = _front_camera(width=80, height=64)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    kw = dict(pair_budget=8 * p.capacity, backend="pallas",
              interpret=True)

    base = rasterizer.render(p, cam, bg, **kw)
    wide = rasterizer.render(p, cam, bg, force_wide=True, **kw)
    for f in ("rgb", "depth", "alpha"):
        np.testing.assert_array_equal(np.asarray(getattr(wide, f)),
                                      np.asarray(getattr(base, f)),
                                      err_msg=f)
    assert int(wide.pairs) == int(base.pairs)
    assert int(wide.expand_needed) == int(base.expand_needed)

    # Interleaved band mode + cull ride the same wide keys.
    bkw = dict(kw, band_rows=2, band_stride=2, cull_n=p.capacity - 1)
    b0 = rasterizer.render(p, cam, bg, band_row0=jnp.int32(1), **bkw)
    w0 = rasterizer.render(p, cam, bg, band_row0=jnp.int32(1),
                           force_wide=True, **bkw)
    np.testing.assert_array_equal(np.asarray(w0.rgb), np.asarray(b0.rgb))
    assert int(w0.cull_needed) == int(b0.cull_needed)

    tgt = jnp.asarray(
        np.random.default_rng(3).random((64, 80, 3)), jnp.float32)

    def loss(xyz, fw):
        out = rasterizer.render(dataclasses.replace(p, xyz=xyz), cam, bg,
                                force_wide=fw, **kw)
        return jnp.sum((out.rgb - tgt) ** 2)

    g0 = jax.grad(loss)(p.xyz, False)
    g1 = jax.grad(loss)(p.xyz, True)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))


@_isolated
def test_wide_keys_binning_level():
    """bin_gaussians wide vs packed: identical gid_sorted / seg_start /
    counts on the pallas segment layout, via both the expansion kernel
    (interpret) and the XLA delta-scatter expansion.

    Subprocess-isolated: this test's interpret-mode expansion graphs hit
    the documented XLA:CPU late-session compile segfault (it killed the
    round-5 full-suite run at test #157 — same signature as the
    ``_isolated`` docstring's repro)."""
    from multiview_inpaint_tpu.ops.rasterizer import binning

    rng = np.random.default_rng(5)
    n = 300
    means2d = jnp.asarray(rng.uniform(-10, 90, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.integers(0, 12, n), jnp.int32)
    depth = jnp.asarray(rng.uniform(0.5, 9.0, n), jnp.float32)
    for expand_kernel in (True, False):
        kw = dict(tiles_x=5, tiles_y=4, tile_w=16, tile_h=16,
                  pair_budget=1024, max_per_tile=64, gather_ids=False,
                  aligned_chunk=128, expand_kernel=expand_kernel,
                  interpret=True)
        a = binning.bin_gaussians(means2d, radius, depth, **kw)
        # Every wide-key encoding (fused u32 / 16-bit tile operand /
        # 2x int32 lexicographic) must match the packed path exactly.
        for mode in ("auto", "u32", "i16", "lex"):
            b = binning.bin_gaussians(means2d, radius, depth,
                                      force_wide=True, wide_mode=mode,
                                      **kw)
            np.testing.assert_array_equal(np.asarray(b.gid_sorted),
                                          np.asarray(a.gid_sorted),
                                          err_msg=mode)
            np.testing.assert_array_equal(np.asarray(b.seg_start),
                                          np.asarray(a.seg_start))
            np.testing.assert_array_equal(np.asarray(b.counts),
                                          np.asarray(a.counts))
            np.testing.assert_array_equal(np.asarray(b.order),
                                          np.asarray(a.order))
            assert int(b.total_pairs) == int(a.total_pairs)


def test_rect_pack_bound_fallback():
    """Grids past the payload-packing bound (count would overflow the
    low 16 bits of the packed rect payload, e.g. 8K frames at 16x16
    tiles) must take the permutation-gather fallback and produce
    IDENTICAL bins. Forced here by monkeypatching the static limit so
    the fallback runs on a small grid."""
    from multiview_inpaint_tpu.ops.rasterizer import binning

    rng = np.random.default_rng(7)
    n = 300
    means2d = jnp.asarray(rng.uniform(-10, 90, (n, 2)), jnp.float32)
    radius = jnp.asarray(rng.integers(0, 12, n), jnp.int32)
    depth = jnp.asarray(rng.uniform(0.5, 9.0, n), jnp.float32)
    kw = dict(tiles_x=5, tiles_y=4, tile_w=16, tile_h=16,
              pair_budget=1024, max_per_tile=64, gather_ids=False,
              aligned_chunk=128, interpret=True)
    a = binning.bin_gaussians(means2d, radius, depth, **kw)
    limit = binning._RECT_PACK_TILE_LIMIT
    try:
        binning._RECT_PACK_TILE_LIMIT = 1
        b = binning.bin_gaussians(means2d, radius, depth, **kw)
    finally:
        binning._RECT_PACK_TILE_LIMIT = limit
    for f in ("gid_sorted", "seg_start", "counts", "order"):
        np.testing.assert_array_equal(np.asarray(getattr(b, f)),
                                      np.asarray(getattr(a, f)))
    assert int(b.total_pairs) == int(a.total_pairs) > 0
