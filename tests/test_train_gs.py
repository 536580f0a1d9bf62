"""Densification unit tests + GS training integration test."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.gs import densify, gaussians, cameras
from multiview_inpaint_tpu.gs.densify import DensifyStats
from multiview_inpaint_tpu.models import gs_trainer
from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
from multiview_inpaint_tpu.utils import sh as sh_utils
from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid


def _params(n=4, capacity=8, scale=0.05, opacity=0.8, seed=0):
    rng = np.random.default_rng(seed)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(
        rng.random((n, 3))))).reshape(n, 1, 3)
    return gaussians.from_arrays(
        rng.normal(size=(n, 3)).astype(np.float32), dc,
        np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(opacity)))),
        np.full((n, 3), np.log(scale), np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=capacity)


def _stats_with_grad(capacity, hot_rows, value=1.0):
    s = DensifyStats.zeros(capacity)
    ga = s.grad_accum
    for r in hot_rows:
        ga = ga.at[r].set(value)
    return dataclasses.replace(s, grad_accum=ga,
                               denom=jnp.ones_like(s.denom))


def test_clone_small_gaussian():
    p = _params(n=4, capacity=8, scale=0.005)  # small vs extent 1
    stats = _stats_with_grad(8, [1])
    res = densify.densify_and_prune(p, stats, jax.random.key(0),
                                    grad_threshold=0.5, min_opacity=0.005,
                                    extent=1.0, max_screen_size=None)
    assert int(res.n_cloned) == 1 and int(res.n_split) == 0
    q = res.params
    assert int(q.num_live()) == 5
    # clone landed in first free slot (4) with identical attributes
    np.testing.assert_allclose(np.asarray(q.xyz[4]), np.asarray(p.xyz[1]))
    np.testing.assert_allclose(np.asarray(q.opacity[4]),
                               np.asarray(p.opacity[1]))
    assert bool(res.moment_reset[4]) and not bool(res.moment_reset[1])


def test_split_large_gaussian():
    p = _params(n=4, capacity=8, scale=0.5)  # large vs extent 1
    stats = _stats_with_grad(8, [2])
    res = densify.densify_and_prune(p, stats, jax.random.key(1),
                                    grad_threshold=0.5, min_opacity=0.005,
                                    extent=1.0, max_screen_size=None)
    assert int(res.n_split) == 1 and int(res.n_cloned) == 0
    q = res.params
    assert int(q.num_live()) == 5  # net +1
    # both resamples have scale reduced by 1.6
    np.testing.assert_allclose(np.asarray(q.scaling[2]),
                               np.log(0.5 / 1.6), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q.scaling[4]),
                               np.log(0.5 / 1.6), rtol=1e-5)
    # resampled positions moved, but within a few sigma of the original
    d2 = float(jnp.linalg.norm(q.xyz[2] - p.xyz[2]))
    assert 0 < d2 < 5 * 0.5 * np.sqrt(3)
    assert bool(res.moment_reset[2]) and bool(res.moment_reset[4])


def test_prune_low_opacity():
    p = _params(n=4, capacity=8, opacity=0.9)
    p = dataclasses.replace(
        p, opacity=p.opacity.at[3, 0].set(float(
            inverse_sigmoid(jnp.asarray(0.001)))))
    stats = DensifyStats.zeros(8)
    res = densify.densify_and_prune(p, stats, jax.random.key(2),
                                    grad_threshold=0.5, min_opacity=0.005,
                                    extent=1.0, max_screen_size=None)
    assert int(res.n_pruned) == 1
    assert not bool(res.params.live[3])
    assert int(res.params.num_live()) == 3


def test_prune_big_screen_and_world():
    p = _params(n=4, capacity=8, scale=0.05)
    p = dataclasses.replace(p, scaling=p.scaling.at[0].set(np.log(0.3)))
    stats = dataclasses.replace(DensifyStats.zeros(8),
                                max_radii2d=DensifyStats.zeros(8)
                                .max_radii2d.at[1].set(50))
    res = densify.densify_and_prune(p, stats, jax.random.key(3),
                                    grad_threshold=0.5, min_opacity=0.005,
                                    extent=1.0, max_screen_size=20)
    # row0: world-size prune (0.3 > 0.1*extent); row1: screen-size prune
    assert not bool(res.params.live[0])
    assert not bool(res.params.live[1])
    assert int(res.params.num_live()) == 2


def test_capacity_overflow_reported_and_growable():
    p = _params(n=7, capacity=8, scale=0.005)
    stats = _stats_with_grad(8, list(range(7)))
    res = densify.densify_and_prune(p, stats, jax.random.key(4),
                                    grad_threshold=0.5, min_opacity=0.005,
                                    extent=1.0, max_screen_size=None)
    assert int(res.wanted_slots) == 7
    assert int(res.granted_slots) == 1
    assert int(res.params.num_live()) == 8  # full
    q, s = densify.grow_capacity(res.params, res.stats, 16)
    assert q.capacity == 16 and int(q.num_live()) == 8
    assert not bool(q.live[8])


def test_reset_opacity():
    p = _params(n=4, capacity=8, opacity=0.9)
    q, mask = densify.reset_opacity(p)
    np.testing.assert_allclose(np.asarray(q.act_opacity())[:4], 0.01,
                               rtol=1e-4)
    # dead rows untouched
    np.testing.assert_allclose(np.asarray(q.opacity)[4:], -15.0)
    assert np.array_equal(np.asarray(mask), np.asarray(p.live))


def _scene_and_target(seed=0, width=48, height=48):
    """A ground-truth scene rendered to an image + a perturbed init."""
    rng = np.random.default_rng(seed)
    n = 24
    xyz = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    rgbs = rng.random((n, 3)).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgbs))).reshape(n, 1, 3)
    true = gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.85)))),
        np.full((n, 3), np.log(0.18), np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    cam = cameras.make_camera(0, np.eye(3), np.array([0.0, 0, 3.0]),
                              fovx=0.9, fovy=0.9, width=width, height=height)
    rcam = RenderCamera.from_camera(cam)
    target = render(true, rcam, jnp.zeros(3), max_per_tile=128,
                    pair_budget=8 * n).rgb
    # init: perturbed positions + gray colors
    init = gaussians.from_arrays(
        xyz + rng.normal(scale=0.1, size=(n, 3)).astype(np.float32),
        np.zeros_like(dc), np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.5)))),
        np.full((n, 3), np.log(0.15), np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=64)
    return init, rcam, target


def test_training_fits_scene():
    init, rcam, target = _scene_and_target()
    cfg = gs_trainer.OptimizationConfig(
        densify_from_iter=20, densify_until_iter=120,
        densification_interval=40, opacity_reset_interval=10_000,
        position_lr_init=0.01, position_lr_final=0.001,
        position_lr_max_steps=200)
    state = gs_trainer.init_state(init)
    bg = jnp.zeros(3)
    first_loss = None
    key = jax.random.key(0)
    for it in range(1, 151):
        state, metrics = gs_trainer.train_step(
            state, rcam, target, bg, cfg, spatial_lr_scale=1.0,
            max_per_tile=128, pair_budget_mult=8)
        if first_loss is None:
            first_loss = float(metrics.loss)
        key, sub = jax.random.split(key)
        state, info = gs_trainer.maybe_densify(state, sub, cfg,
                                               extent=1.6, iteration=it)
        state = gs_trainer.grow_if_needed(state, info)
    final_loss = float(metrics.loss)
    assert final_loss < 0.5 * first_loss, (first_loss, final_loss)
    assert np.all(np.isfinite(np.asarray(state.params.xyz)))


def test_training_background_masked_mode():
    init, rcam, target = _scene_and_target(seed=1)
    cfg = gs_trainer.OptimizationConfig(densify_from_iter=10_000)
    state = gs_trainer.init_state(init)
    mask = jnp.zeros(target.shape[:2]).at[:, 24:].set(1.0)
    state, m = gs_trainer.train_step(
        state, rcam, target, jnp.zeros(3), cfg, 1.0, mask=mask,
        loss_mode="background", max_per_tile=128, pair_budget_mult=8)
    assert np.isfinite(float(m.loss))
