"""GS train-step benchmark: 512x384 view, 200k live gaussians.

The round-2/3 perf ladder's training workload (PERF.md): one
``gs_trainer.train_step`` (render fwd + fused pallas bwd + Adam) on a
synthetic 200k-splat scene in a 262k-capacity buffer, pair budget
mult=3. Reports ms/step and it/s, plus fwd-only and fwd+bwd splits.

    python -u scripts/bench_gs_train_step.py [--mult 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mult", type=int, default=3)
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--capacity", type=int, default=262_144)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.models import gs_trainer
    from multiview_inpaint_tpu.models.gs_trainer import OptimizationConfig
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    n, cap = args.n, args.capacity
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = rng.uniform(0.3, 1.0, n) ** (1 / 3)
    xyz = np.stack([r * np.sin(phi) * np.cos(theta),
                    r * np.sin(phi) * np.sin(theta),
                    r * np.cos(phi)], -1).astype(np.float32)
    rgb = (xyz * 0.5 + 0.5).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    params = gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.8)))),
        np.log(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32)),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=cap)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.8, width=512, height=384)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (384, 512, 3)).astype(np.float32))
    cfg = OptimizationConfig()
    state = gs_trainer.init_state(params)
    kw = dict(cfg=cfg, spatial_lr_scale=1.0, sh_degree=0,
              max_per_tile=1024, pair_budget_mult=args.mult,
              backend="pallas")

    # fwd-only render
    fwd = jax.jit(lambda p: render(p, rcam, bg, sh_degree=0,
                                   pair_budget=args.mult * cap,
                                   backend="pallas").rgb)
    t_f, _ = _timeit(fwd, state.params)

    # fwd+bwd (grad of the same photometric loss, no Adam)
    def loss_only(p):
        out = render(p, rcam, bg, sh_degree=0,
                     pair_budget=args.mult * cap, backend="pallas")
        return jnp.mean(jnp.abs(out.rgb - gt))

    gradf = jax.jit(jax.grad(
        lambda fields: loss_only(
            gaussians.GaussianParams(live=state.params.live, **fields))))
    fields = {f: getattr(state.params, f) for f in
              ("xyz", "features_dc", "features_rest", "opacity",
               "scaling", "rotation")}
    t_g, _ = _timeit(gradf, fields)

    def step(state):
        return gs_trainer.train_step(state, rcam, gt, bg, **kw)

    _, (_, m0) = _timeit(step, state, iters=1)
    need = int(m0.expand_needed)
    kw["expand_window"] = max(-(-(need + 32) // 16) * 16, 32)
    # Tight fractional budget: every budgeted slot rides the sort and
    # both big row gathers, so 1.05x true pairs beats a round multiple.
    kw["pair_budget_mult"] = round(1.05 * int(m0.pairs) / cap, 3)
    t_s, (state2, metrics) = _timeit(step, state)
    assert int(metrics.expand_needed) <= kw["expand_window"]
    assert int(metrics.pairs) <= kw["pair_budget_mult"] * cap
    print(f"pairs={int(metrics.pairs)} "
          f"budget={int(kw['pair_budget_mult'] * cap)} "
          f"window={kw['expand_window']}")
    print(f"fwd={t_f*1e3:.1f}ms fwd+bwd={t_g*1e3:.1f}ms "
          f"step={t_s*1e3:.1f}ms ({1/t_s:.2f} it/s)", flush=True)
    import json
    print(json.dumps({
        "metric": "gs_train_step", "n_gaussians": n, "capacity": cap,
        "pairs": int(metrics.pairs),
        "fwd_ms": round(t_f * 1e3, 2), "fwd_bwd_ms": round(t_g * 1e3, 2),
        "step_ms": round(t_s * 1e3, 2), "it_per_s": round(1 / t_s, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
