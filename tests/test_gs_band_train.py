"""Band-sharded GS training step == single-device training step.

``parallel/gs_band_train.band_train_step`` shards ONE frame's tile rows
over the virtual 8-mesh and must reproduce ``gs_trainer.train_step``
(loss_mode="full") exactly up to f32 reduction order: the band renders
are bit-identical to the full frame (xla backend), the stitched image
drives the same L1+SSIM, and the psum'd gradients differ from the
single-device ones only by cross-band summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.gs import cameras, gaussians
from multiview_inpaint_tpu.models import gs_trainer
from multiview_inpaint_tpu.ops.rasterizer import RenderCamera
from multiview_inpaint_tpu.parallel import make_mesh
from multiview_inpaint_tpu.parallel.gs_band_train import band_train_step
from multiview_inpaint_tpu.utils import sh as sh_utils
from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid


def _scene(n=96, seed=11):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 0.6, (n, 3)).astype(np.float32)
    rgb = rng.random((n, 3)).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    return gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.asarray(inverse_sigmoid(
            jnp.asarray(rng.uniform(0.4, 0.9, (n, 1)).astype(np.float32)))),
        np.log(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))


@pytest.fixture(scope="module")
def setup():
    p = _scene()
    # 8 tile rows (height 128) so every band of the 8-mesh owns one.
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0.0, 4.0]),
                              fovx=0.9, fovy=1.1, width=64, height=128)
    rc = RenderCamera.from_camera(cam)
    gt = jnp.asarray(
        np.random.default_rng(5).random((128, 64, 3)), jnp.float32)
    bg = jnp.asarray([0.2, 0.35, 0.1])
    cfg = gs_trainer.OptimizationConfig()
    return p, rc, gt, bg, cfg


def _assert_state_close(a, b, rtol=3e-5, atol=3e-6):
    for f in gs_trainer._FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(a.params, f)),
            np.asarray(getattr(b.params, f)), rtol=rtol, atol=atol,
            err_msg=f)
        np.testing.assert_allclose(np.asarray(a.mu[f]),
                                   np.asarray(b.mu[f]),
                                   rtol=rtol, atol=atol, err_msg=f)


def test_band_step_matches_single_device(setup):
    p, rc, gt, bg, cfg = setup
    state0 = gs_trainer.init_state(p)

    ref_state, ref_m = gs_trainer.train_step(
        state0, rc, gt, bg, cfg, spatial_lr_scale=1.0,
        pair_budget_mult=8, backend="xla")
    band_state, band_m = band_train_step(
        state0, rc, gt, bg, cfg, spatial_lr_scale=1.0,
        mesh=make_mesh(8), pair_budget_mult=8, backend="xla")

    # Same objective on the stitched frame (xla bands are bit-identical
    # to the full frame, so the loss is too).
    np.testing.assert_allclose(float(band_m.loss), float(ref_m.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(band_m.l1), float(ref_m.l1),
                               rtol=1e-6)
    # Every gaussian-tile pair lives in exactly one band.
    assert int(band_m.pairs) == int(ref_m.pairs)
    assert int(band_state.step) == int(ref_state.step) == 1
    _assert_state_close(band_state, ref_state)
    # Densify-stat contract: psum'd means2d grads + replicated
    # projection radii/visibility.
    np.testing.assert_allclose(np.asarray(band_state.stats.grad_accum),
                               np.asarray(ref_state.stats.grad_accum),
                               rtol=3e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(band_state.stats.denom),
                                  np.asarray(ref_state.stats.denom))


def test_band_step_threads_and_culls(setup):
    p, rc, gt, bg, cfg = setup
    state = gs_trainer.init_state(p)
    mesh = make_mesh(8)
    # Two chained band steps stay finite and keep optimizing.
    state, m1 = band_train_step(state, rc, gt, bg, cfg, 1.0, mesh,
                                pair_budget_mult=8, backend="xla")
    state, m2 = band_train_step(state, rc, gt, bg, cfg, 1.0, mesh,
                                pair_budget_mult=8, backend="xla")
    assert np.isfinite(float(m2.loss))
    assert float(m2.loss) < float(m1.loss)
    assert int(state.step) == 2

    # Per-band N-culling composes: same update within cull tolerance
    # (cull_n = capacity keeps every gaussian eligible, exercising the
    # culled code path with full coverage).
    s_cull, m_cull = band_train_step(
        gs_trainer.init_state(p), rc, gt, bg, cfg, 1.0, mesh,
        pair_budget_mult=8, backend="xla", cull_n=p.capacity - 1)
    s_ref, _ = band_train_step(
        gs_trainer.init_state(p), rc, gt, bg, cfg, 1.0, mesh,
        pair_budget_mult=8, backend="xla")
    _assert_state_close(s_cull, s_ref)


def test_band_step_zero_sharded_matches(setup):
    """ZeRO-sharded band step == single-device step: reduce-scattered
    grads + per-shard Adam/stats + param all-gather produce the same
    state (up to f32 reduction order), with optimizer moments and
    densify stats left SHARDED over the mesh (1/D per device)."""
    p, rc, gt, bg, cfg = setup
    mesh = make_mesh(8)
    state0 = gs_trainer.init_state(p)

    ref_state, ref_m = gs_trainer.train_step(
        state0, rc, gt, bg, cfg, spatial_lr_scale=1.0,
        pair_budget_mult=8, backend="xla")
    z_state, z_m = band_train_step(
        state0, rc, gt, bg, cfg, spatial_lr_scale=1.0, mesh=mesh,
        pair_budget_mult=8, backend="xla", zero_sharded=True)

    np.testing.assert_allclose(float(z_m.loss), float(ref_m.loss),
                               rtol=1e-6)
    assert int(z_m.pairs) == int(ref_m.pairs)
    _assert_state_close(z_state, ref_state)
    for f in gs_trainer._FIELDS:
        np.testing.assert_allclose(np.asarray(z_state.nu[f]),
                                   np.asarray(ref_state.nu[f]),
                                   rtol=3e-5, atol=1e-10, err_msg=f)
    np.testing.assert_allclose(np.asarray(z_state.stats.grad_accum),
                               np.asarray(ref_state.stats.grad_accum),
                               rtol=3e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(z_state.stats.denom),
                                  np.asarray(ref_state.stats.denom))
    # Moments/stats really are sharded (params replicated for render).
    mu_shard = z_state.mu["xyz"].sharding
    assert not mu_shard.is_fully_replicated
    assert z_state.params.xyz.sharding.is_fully_replicated
    # And the sharded state chains: a second ZeRO step keeps training.
    z2, m2 = band_train_step(z_state, rc, gt, bg, cfg, 1.0, mesh,
                             pair_budget_mult=8, backend="xla",
                             zero_sharded=True)
    assert np.isfinite(float(m2.loss))
    assert float(m2.loss) < float(z_m.loss)
    assert int(z2.step) == 2
