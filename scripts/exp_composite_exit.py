"""EXPERIMENT: re-measure the saturation early-exit on the bench scene.

The round-3 measurement (exit costs 1.3-1.5 ms/frame, loses at avg 1.2
chunks/tile) predates the current binning: the bench scene now runs
3.35 chunks per nonempty tile, opacity is 0.8 and splats span whole
tiles, so transmittance should saturate within the first chunk for
most tiles — the exit may now win. Times early_exit on/off on the real
1080p composite inputs (output is identical either way by design).

    python -u scripts/exp_composite_exit.py             # TPU
    EXP_INTERPRET=1 python -u scripts/exp_composite_exit.py  # CPU smoke
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

INTERPRET = os.environ.get("EXP_INTERPRET") == "1"
if INTERPRET:
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera,
                                                      binning, geometry,
                                                      pallas_composite)
    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        pair_attrs_bf16)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    n = 2_000 if INTERPRET else 100_000
    w, h = (256, 128) if INTERPRET else (1920, 1080)
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
                      fovx=1.1, fovy=0.7, width=w, height=h)
    rc = RenderCamera.from_camera(cam)

    tile_h = tile_w = 16
    tiles_x, tiles_y = -(-w // tile_w), -(-h // tile_h)
    c = pallas_composite.CHUNK
    pair_budget = -(-13 * n // c) * c
    if pair_budget % 1024 == 0:
        pair_budget += c

    @jax.jit
    def make_inputs(p):
        proj = geometry.project_gaussians(
            p.xyz, p.features(), p.act_opacity()[:, 0], p.act_scaling(),
            p.act_rotation(), p.live, rc.world_view, rc.full_proj,
            rc.campos, rc.tan_fovx, rc.tan_fovy, rc.width, rc.height,
            0, 1.0, None)
        packed = pallas_composite.pack_attrs(
            proj.means2d, proj.conic, proj.opacity, proj.color,
            proj.depth)
        bins = binning.bin_gaussians(
            proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
            tile_w, tile_h, pair_budget, 1024, gather_ids=False,
            aligned_chunk=c, extent=proj.extent, expand_kernel=True,
            interpret=INTERPRET)
        attrs_t = pair_attrs_bf16(packed, bins.order, bins.gid_sorted,
                                  bins.rank_lo)
        return attrs_t, bins.seg_start, bins.counts

    attrs_t, seg_start, counts = jax.block_until_ready(
        make_inputs(params))
    bg = jnp.zeros(3, jnp.float32)

    def run(exit_):
        return pallas_composite.composite_pallas(
            attrs_t, seg_start, counts, bg, tiles_x, tiles_y, tile_h,
            tile_w, interpret=INTERPRET, early_exit=exit_)

    out_f = jax.block_until_ready(run(False))
    out_t = jax.block_until_ready(run(True))
    d = float(jnp.max(jnp.abs(out_f - out_t)))
    print(f"max|off - on| = {d:.3e}", flush=True)
    assert d == 0.0

    iters = 3 if INTERPRET else 50
    for exit_ in (False, True, False, True):
        jax.block_until_ready(run(exit_))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = run(exit_)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"early_exit={exit_!s:5s}: {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
