"""Benchmark: 1080p differentiable splat render (RGB+depth) FPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is FPS / 100 (the driver's north-star target of >=100 FPS at
1080p, BASELINE.md "Rebuild targets"; the reference publishes no numbers).

Runs on whatever the default JAX backend is (the driver provides one real
TPU chip via axon). Scene: 100k procedurally-placed gaussians.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    n = 100_000
    rng = np.random.default_rng(0)
    # A ball of splats plus a ground plane, roughly framed by the camera.
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

    # 13*n covers this scene's true pair count (~11.8*n with the 3-sigma
    # AABB rects). Every budgeted slot rides the pair sort and the
    # attribute gather, so the budget is kept tight and overflow-checked
    # below before timing. (Segments are unaligned since round 3 — no
    # alignment-padding pairs exist.)
    kwargs = dict(sh_degree=0, pair_budget=13 * n, backend="pallas")

    # Warmup / compile.
    out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)

    # No-overflow check: the timed config must not clip pairs.
    if int(out.pairs) > kwargs["pair_budget"]:
        print(f"pair budget overflow: {int(out.pairs)}", file=sys.stderr)
        return 1

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "splat_render_1080p_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
