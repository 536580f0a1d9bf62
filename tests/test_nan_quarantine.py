"""Non-finite-row quarantine: poisoned params cull instead of spreading.

Regression suite for a real divergence observed during the 30k-iter
reference-cadence run: one degenerate backward wrote inf/NaN into the
Adam moments, the poisoned rows' rects hit undefined int32 casts in
binning, and the WHOLE frame's pair table zeroed (an absorbing state —
no pairs, no gradients, no recovery). The defenses under test:

- ``geometry.project``: non-finite covariance / center / depth rows are
  culled (radius 0, extent 0, sanitized means2d) so the binning tables
  stay well-defined (the render equals the same scene with those rows
  dead);
- ``GaussianParams.act_scaling``: clamped exp — a drifted log-scale
  cannot overflow the EWA covariance;
- ``densify_and_prune``: non-finite rows are never cloned/split
  (resampling from a NaN parent spreads the poison) and are pruned so
  the slot recycles;
- ``train_step``: non-finite gradient entries are zeroed before Adam
  and counted in ``StepMetrics.nonfinite_grads``.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multiview_inpaint_tpu.gs import densify as densify_mod
from multiview_inpaint_tpu.gs import gaussians
from multiview_inpaint_tpu.models import gs_trainer
from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render

from multiview_inpaint_tpu.utils.synthetic import make_gt_gaussians
from scripts.exp_densify_scale import orbit_cameras


def _rcam():
    return RenderCamera.from_camera(orbit_cameras(3, 3.0, 64, 48)[0])


def _render(params, bg=0.0):
    return render(params, _rcam(), jnp.full((3,), bg, jnp.float32),
                  sh_degree=0, backend="xla")


def _poison(params, idx_nan_xyz, idx_big_scale):
    xyz = params.xyz.at[idx_nan_xyz].set(jnp.nan)
    scaling = params.scaling.at[idx_big_scale].set(100.0)  # exp -> clamp
    return dataclasses.replace(params, xyz=xyz, scaling=scaling)


def test_act_scaling_clamped():
    p = make_gt_gaussians(n=4)
    p = dataclasses.replace(p, scaling=p.scaling.at[0].set(500.0))
    s = np.asarray(p.act_scaling())
    assert np.all(np.isfinite(s))
    assert s.max() <= np.exp(20.0) * 1.0001


def test_poisoned_rows_render_as_dead():
    p = make_gt_gaussians(n=24, capacity=32)
    bad = _poison(p, idx_nan_xyz=3, idx_big_scale=7)
    # Reference: same scene with the poisoned rows dead. Row 7's huge
    # scale is CLAMPED (not culled) so kill it in both to compare.
    dead = dataclasses.replace(
        bad, live=bad.live.at[jnp.array([3, 7])].set(False))
    out_bad_row7_dead = _render(dataclasses.replace(
        bad, live=bad.live.at[jnp.array([7])].set(False)))
    out_dead = _render(dead)
    rb = np.asarray(out_bad_row7_dead.rgb)
    rd = np.asarray(out_dead.rgb)
    assert np.all(np.isfinite(rb))
    np.testing.assert_allclose(rb, rd, atol=1e-6)
    # The NaN row culls: zero radius, not visible.
    assert int(out_bad_row7_dead.radii[3]) == 0
    # And the frame is NOT empty — healthy rows still have pairs.
    assert int(out_bad_row7_dead.pairs) > 0


def test_densify_quarantines_nonfinite_rows():
    p = make_gt_gaussians(n=16, capacity=32)
    bad = _poison(p, idx_nan_xyz=2, idx_big_scale=5)
    stats = densify_mod.DensifyStats.zeros(bad.capacity)
    # Give every live row a hot gradient so clone/split would fire.
    stats = dataclasses.replace(
        stats,
        grad_accum=jnp.where(bad.live, 1.0, 0.0),
        denom=jnp.where(bad.live, 1.0, 0.0))
    res = densify_mod.densify_and_prune(
        bad, stats, jax.random.key(0), grad_threshold=1e-6,
        min_opacity=0.005, extent=3.5, max_screen_size=None)
    out = res.params
    # NaN row pruned (the slot may be immediately recycled by a clone,
    # in which case it is live again with HEALTHY values — checked by
    # the finite sweep below).
    assert int(res.n_pruned) >= 1
    assert bool(jnp.all(jnp.isfinite(out.xyz[2]))) or not bool(out.live[2])
    # No NaN anywhere among live rows (the poison did not spread).
    live = np.asarray(out.live)
    for f in ("xyz", "scaling", "opacity", "rotation"):
        v = np.asarray(getattr(out, f))[live]
        assert np.all(np.isfinite(v)), f


def test_train_step_zeroes_nonfinite_grads():
    p = make_gt_gaussians(n=12, capacity=16)
    state = gs_trainer.init_state(p)
    cam = _rcam()
    gt = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    cfg = gs_trainer.OptimizationConfig()
    state2, metrics = gs_trainer.train_step(
        state, cam, gt, jnp.zeros(3, jnp.float32), cfg,
        spatial_lr_scale=1.0, backend="xla")
    # Healthy scene: zero non-finite entries, finite moments.
    assert int(metrics.nonfinite_grads) == 0
    for f in gs_trainer._FIELDS:
        assert np.all(np.isfinite(np.asarray(state2.mu[f])))
    # Poisoned scene: params with NaN xyz row must not poison the
    # OTHER rows' moments through the shared reductions.
    bad = _poison(p, idx_nan_xyz=1, idx_big_scale=4)
    stateb = gs_trainer.init_state(bad)
    stateb2, mb = gs_trainer.train_step(
        stateb, cam, gt, jnp.zeros(3, jnp.float32), cfg,
        spatial_lr_scale=1.0, backend="xla")
    live = np.asarray(bad.live)
    ok_rows = live.copy()
    ok_rows[1] = False
    for f in gs_trainer._FIELDS:
        mu = np.asarray(stateb2.mu[f])[ok_rows]
        assert np.all(np.isfinite(mu)), f
        prm = np.asarray(getattr(stateb2.params, f))[ok_rows]
        assert np.all(np.isfinite(prm)), f
