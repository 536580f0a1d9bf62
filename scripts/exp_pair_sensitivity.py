"""EXPERIMENT: how much frame time does a pair-count reduction buy?

Simulates ellipse culling by scaling the binning extents at runtime
(device scalar -> ONE compile serves all scales). The render is slightly
wrong at the gate boundary for scale < 1 (timing-only experiment); what
matters is the stage-time response to the pair count, which bounds the
payoff of exact ellipse-row culling before building it.

    python -u scripts/exp_pair_sensitivity.py
"""

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
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera, binning,
                                                      geometry,
                                                      pallas_composite,
                                                      segment_reduce)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

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
    PB = 13 * n
    tiles_x, tiles_y = -(-1920 // 16), -(-1080 // 16)
    CHUNK = pallas_composite.CHUNK

    @jax.jit
    def stage_project(params):
        return geometry.project_gaussians(
            params.xyz, params.features(), params.act_opacity()[:, 0],
            params.act_scaling(), params.act_rotation(), params.live,
            rcam.world_view, rcam.full_proj, rcam.campos, rcam.tan_fovx,
            rcam.tan_fovy, rcam.width, rcam.height, 0, 1.0, None)

    @jax.jit
    def stage_binning(proj, scale):
        packed = pallas_composite.pack_attrs(
            proj.means2d, proj.conic, proj.opacity, proj.color,
            proj.depth)
        return binning.bin_gaussians(
            proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
            16, 16, PB, 1024, gather_ids=False, aligned_chunk=CHUNK,
            extent=proj.extent * scale, expand_kernel=True, aux=packed)

    @jax.jit
    def stage_gather(bins):
        pk = jnp.concatenate(
            [bins.aux_sorted, jnp.zeros((1, bins.aux_sorted.shape[1]))])
        return segment_reduce.gather_pairs(pk, bins.gid_sorted,
                                           bins.rank_lo).T

    @jax.jit
    def stage_composite(attrs_t, seg_start, counts):
        return pallas_composite.composite_pallas(
            attrs_t, seg_start, counts, bg, tiles_x, tiles_y)

    proj = jax.block_until_ready(stage_project(params))

    # Gather lane-width A/B: the pair gather is random-access
    # latency-bound (PERF.md); if HBM transactions per row set the
    # floor, narrower rows should cut it (64B -> 48B -> 32B rows).
    bins0 = jax.block_until_ready(stage_binning(proj, jnp.float32(1.0)))
    for lanes in (16, 12, 8):
        @jax.jit
        def g(bins):
            pk = jnp.concatenate(
                [bins.aux_sorted[:, :lanes],
                 jnp.zeros((1, lanes))])
            return segment_reduce.gather_pairs(pk, bins.gid_sorted,
                                               bins.rank_lo).T
        t, _ = _timeit(g, bins0)
        print(f"gather lanes={lanes}: {t*1e3:.2f}ms", flush=True)

    for s in (1.0, 0.92, 0.85, 0.75):
        sc = jnp.float32(s)
        t_bin, bins = _timeit(stage_binning, proj, sc)
        t_gather, attrs_t = _timeit(stage_gather, bins)
        t_comp, _ = _timeit(stage_composite, attrs_t, bins.seg_start,
                            bins.counts)
        print(f"scale={s}: pairs={int(bins.total_pairs)} "
              f"binning={t_bin*1e3:.2f}ms gather={t_gather*1e3:.2f}ms "
              f"composite={t_comp*1e3:.2f}ms "
              f"sum={1e3*(t_bin+t_gather+t_comp):.2f}ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
