"""EXPERIMENT (VERDICT r4 #4): the last two single-chip composite levers.

Times the REAL fused composite kernel (``pallas_composite.composite_pallas``,
the one the render path jits) on the 100k 1080p bench inputs, A/B-ing the
two instruction-level candidates from the round-4 audit, with accuracy
measured against a stated budget:

  base       shipping kernel (hi/lo f32-split color dot, VPU quadratic
             form) — the 8.8 ms / comp_vpu_frac~1.25 stage.
  mxu_power  quadratic form as ONE [pix,8]@[8,CHUNK] monomial matmul on
             the MXU (hi/lo bf16-split coefficient rows), removing ~9
             full-width VPU ops from the critical path (#4a).
  bf16_color single-pass bf16 color dot: drops 2 of 3 MXU passes and
             the hi/lo split VPU ops (#4b).

Error budget: the pallas path's existing cross-backend envelope vs the
bit-houest XLA compositor is ~3.3e-4 on composited rgb at hw (CLAUDE.md /
tests). A variant is admissible only if its max |rgb - base| stays at or
below that order; otherwise it is a costed negative result.

    python -u scripts/exp_composite_variant.py [--iters 20]

Emits one JSON line per variant:
  {"variant": ..., "device_ms": ..., "kernel_ms": ...,
   "max_abs_rgbd": ..., "max_abs_T": ..., "xla_env_max_abs": ...}
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TBASE = "/tmp/exp_composite_variant_trace"


def device_ms(fn, iters, tag):
    """(total_device_ms, composite_kernel_ms) per call via xplane."""
    import jax
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    jax.block_until_ready(fn())
    d = os.path.join(TBASE, tag)
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    for _ in range(iters):
        o = fn()
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    pbs = sorted(glob.glob(d + "/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tot = ker = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            meta = plane.event_metadata
            for ev in line.events:
                tot += ev.duration_ps / 1e9
                if "composite" in meta[ev.metadata_id].name.lower():
                    ker += ev.duration_ps / 1e9
    return tot / iters, ker / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--smoke", action="store_true",
                   help="CPU interpret-mode correctness pass (tiny)")
    args = p.parse_args()

    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import (RenderCamera,
                                                      render)
    from multiview_inpaint_tpu.ops.rasterizer import (binning, geometry,
                                                      pallas_composite)
    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        pair_attrs_bf16)
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    # --- bench scene, identical to bench.py / exp_frame_profile -------
    n = 2_000 if args.smoke else 100_000
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
    w, h = (256, 128) if args.smoke else (1920, 1080)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=w, height=h)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    tile_h, tile_w = 16, 16
    tiles_x, tiles_y = -(-w // tile_w), -(-h // tile_h)
    interp = args.smoke

    # cross-backend envelope for the budget statement
    o_xla = render(params, rcam, bg, sh_degree=0, pair_budget=13 * n,
                   backend="xla")
    o_pal = render(params, rcam, bg, sh_degree=0, pair_budget=13 * n,
                   backend="pallas", interpret=interp)
    env = float(jnp.max(jnp.abs(o_xla.rgb - o_pal.rgb)))
    print(json.dumps({"xla_env_max_abs": env,
                      "pairs": int(o_pal.pairs)}), flush=True)

    # --- binned inputs (the render() prefix, pallas flavor) -----------
    pair_budget = -(-13 * n // pallas_composite.CHUNK
                    ) * pallas_composite.CHUNK
    if pair_budget % 1024 == 0:
        pair_budget += pallas_composite.CHUNK

    @jax.jit
    def prefix(params):
        proj = geometry.project_gaussians(
            params.xyz, params.features(), params.act_opacity()[:, 0],
            params.act_scaling(), params.act_rotation(), params.live,
            rcam.world_view, rcam.full_proj, rcam.campos,
            rcam.tan_fovx, rcam.tan_fovy, rcam.width, rcam.height,
            0, 1.0, None)
        packed = pallas_composite.pack_attrs(
            proj.means2d, proj.conic, proj.opacity, proj.color,
            proj.depth)
        bins = binning.bin_gaussians(
            proj.means2d, proj.radius, proj.depth, tiles_x, tiles_y,
            tile_w, tile_h, pair_budget, 1024, gather_ids=False,
            aligned_chunk=pallas_composite.CHUNK, extent=proj.extent,
            expand_kernel=True, interpret=interp)
        attrs_t = pair_attrs_bf16(packed, bins.order, bins.gid_sorted,
                                  bins.rank_lo, bins.order_full)
        return attrs_t, bins.seg_start, bins.counts

    attrs_t, seg_start, counts = jax.block_until_ready(prefix(params))

    run = {}
    for variant in ("base", "mxu_power", "bf16_color"):
        def fn(v=variant):
            return pallas_composite.composite_pallas(
                attrs_t, seg_start, counts, bg, tiles_x, tiles_y,
                tile_h, tile_w, variant=v, interpret=interp)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())   # compile
        compile_s = time.perf_counter() - t0
        run[variant] = np.asarray(out)
        dev, ker = ((0.0, 0.0) if args.smoke
                    else device_ms(fn, args.iters, variant))
        d_rgbd = float(np.max(np.abs(run[variant][..., :4, :]
                                     - run["base"][..., :4, :])))
        d_t = float(np.max(np.abs(run[variant][..., 4, :]
                                  - run["base"][..., 4, :])))
        print(json.dumps({
            "variant": variant, "device_ms": round(dev, 3),
            "kernel_ms": round(ker, 3),
            "max_abs_rgbd": float(f"{d_rgbd:.3e}"),
            "max_abs_T": float(f"{d_t:.3e}"),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
