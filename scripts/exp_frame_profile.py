"""EXPERIMENT: xplane profile of the FULL 1080p render step on TPU.

Runs the bench scene's complete render() 10x under jax.profiler.trace:

    python -u scripts/exp_frame_profile.py /tmp/frame_trace
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_top_ops.py /tmp/frame_trace 40
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
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_trace"

    n = 100_000
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
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=1920, height=1080)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    kwargs = dict(sh_degree=0, pair_budget=13 * n, backend="pallas")

    out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)
    need = int(out.expand_needed)
    window = max(-(-(need + 16) // 16) * 16, 32)
    if window < 288:
        kwargs["expand_window"] = window
        out = render(params, rcam, bg, **kwargs)
        jax.block_until_ready(out.rgb)
    print(f"pairs={int(out.pairs)} window={kwargs.get('expand_window')}",
          flush=True)

    jax.profiler.start_trace(out_dir)
    for _ in range(10):
        out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)
    jax.profiler.stop_trace()
    print(f"trace -> {out_dir} (10 iters; divide op times by 10)",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
