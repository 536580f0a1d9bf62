"""EXPERIMENT: xplane profile of the FULL GS train step on TPU.

Same scene as scripts/bench_gs_train_step.py (512x384, 200k live in a
262k buffer, tight fractional budget + window); 10 steps under
jax.profiler.trace:

    python -u scripts/exp_train_profile.py /tmp/train_trace
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_top_ops.py /tmp/train_trace 40

With ``--big N`` the scene is utils.synthetic.make_big_scene(N)
(reference Mip-360 scale, e.g. N=2000000) instead of the 200k ball —
the train-side counterpart of scripts/bench_scale.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.models import gs_trainer
    from multiview_inpaint_tpu.models.gs_trainer import OptimizationConfig
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    argv = [a for a in sys.argv[1:]]
    big = 0
    if "--big" in argv:
        i = argv.index("--big")
        big = int(argv[i + 1])
        del argv[i:i + 2]
    out_dir = argv[0] if argv else "/tmp/train_trace"
    if big:
        from multiview_inpaint_tpu.utils.synthetic import make_big_scene
        n = big
        params = make_big_scene(n)
        cap = params.capacity
    else:
        n, cap = 200_000, 262_144
        rng = np.random.default_rng(0)
        theta = rng.uniform(0, 2 * np.pi, n)
        phi = np.arccos(rng.uniform(-1, 1, n))
        r = rng.uniform(0.3, 1.0, n) ** (1 / 3)
        xyz = np.stack([r * np.sin(phi) * np.cos(theta),
                        r * np.sin(phi) * np.sin(theta),
                        r * np.cos(phi)], -1).astype(np.float32)
        rgb = (xyz * 0.5 + 0.5).astype(np.float32)
        dc = np.asarray(sh_utils.rgb_to_sh(
            jnp.asarray(rgb))).reshape(n, 1, 3)
        params = gaussians.from_arrays(
            xyz, dc, np.zeros((n, 0, 3), np.float32),
            np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.8)))),
            np.log(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32)),
            np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
            capacity=cap)
    rng = np.random.default_rng(0)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.8, width=512, height=384)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (384, 512, 3)).astype(np.float32))
    cfg = OptimizationConfig()
    state = gs_trainer.init_state(params)
    kw = dict(cfg=cfg, spatial_lr_scale=1.0, sh_degree=0,
              max_per_tile=1024, pair_budget_mult=3, backend="pallas")

    def step(s):
        return gs_trainer.train_step(s, rcam, gt, bg, **kw)

    _, m0 = step(state)
    jax.block_until_ready(m0.pairs)
    kw["expand_window"] = max(
        -(-(int(m0.expand_needed) + 32) // 16) * 16, 32)
    kw["pair_budget_mult"] = round(1.05 * int(m0.pairs) / cap, 3)
    s2, m = step(state)
    jax.block_until_ready(m.pairs)
    print(f"pairs={int(m.pairs)} window={kw['expand_window']}",
          flush=True)

    jax.profiler.start_trace(out_dir)
    s = state
    for _ in range(10):
        s, m = step(s)
    jax.block_until_ready(m.pairs)
    jax.profiler.stop_trace()
    print(f"trace -> {out_dir} (10 steps; divide op times by 10)",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
