"""EXPERIMENT: profile the binning stage (and optionally others) on TPU.

Runs the 1080p bench scene's binning sub-graph 10x under
jax.profiler.trace and dumps the trace for scripts/xplane_top_ops.py.

    python -u scripts/exp_binning_profile.py /tmp/bin_trace
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/xplane_top_ops.py /tmp/bin_trace 40
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
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera, binning,
                                                      geometry,
                                                      pallas_composite)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bin_trace"
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
    PB = 13 * n
    tiles_x, tiles_y = -(-1920 // 16), -(-1080 // 16)
    CHUNK = pallas_composite.CHUNK

    proj = geometry.project_gaussians(
        params.xyz, params.features(), params.act_opacity()[:, 0],
        params.act_scaling(), params.act_rotation(), params.live,
        rcam.world_view, rcam.full_proj, rcam.campos, rcam.tan_fovx,
        rcam.tan_fovy, rcam.width, rcam.height, 0, 1.0, None)
    packed = pallas_composite.pack_attrs(
        proj.means2d, proj.conic, proj.opacity, proj.color, proj.depth)

    @jax.jit
    def stage_binning(proj, packed):
        return binning.bin_gaussians(
            proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
            16, 16, PB, 1024, gather_ids=False, aligned_chunk=CHUNK,
            extent=proj.extent, expand_kernel=True, aux=packed)

    bins = jax.block_until_ready(stage_binning(proj, packed))
    print(f"pairs={int(bins.total_pairs)}", flush=True)
    jax.profiler.start_trace(out_dir)
    for _ in range(10):
        bins = stage_binning(proj, packed)
    jax.block_until_ready(bins)
    jax.profiler.stop_trace()
    print(f"trace -> {out_dir} (10 iters; divide op times by 10)",
          flush=True)


if __name__ == "__main__":
    main()
