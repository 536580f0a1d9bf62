"""Per-band N-culling measurement (round-3 VERDICT item 2).

Band sharding's scaling saturates at ~2.9x on 8 bands because the
N-proportional stages (projection, depth argsort, rect permutation,
expansion prefix) are replayed per band (PERF.md "Scaling limit").
``cull_n`` truncates the depth-rank compaction to the band's active
gaussians, shrinking every downstream N-stage. This script measures
worst/median band time at D = 2/4/8/16 interleaved bands, with and
without culling, on the 1080p bench scene — the scaling-vs-devices
curve for PERF.md and the honest `band_8chip_device_fps` lift.

One executable serves all bands of a config (band_row0 is traced;
cull_n is static and shared = max band need rounded up), so each D
costs two compiles (probe + timed).

    python -u scripts/exp_band_cull.py [--devices 2 4 8 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_scene(n=100_000):
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs import gaussians
    from multiview_inpaint_tpu.utils import sh as sh_utils
    from multiview_inpaint_tpu.utils.schedules import inverse_sigmoid

    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = np.arccos(rng.uniform(-1, 1, n))
    r = rng.uniform(0.3, 1.0, n) ** (1 / 3)
    xyz = np.stack([r * np.sin(phi) * np.cos(theta),
                    r * np.sin(phi) * np.sin(theta),
                    r * np.cos(phi)], -1).astype(np.float32)
    rgb = (xyz * 0.5 + 0.5).astype(np.float32)
    dc = np.asarray(sh_utils.rgb_to_sh(jnp.asarray(rgb))).reshape(n, 1, 3)
    return gaussians.from_arrays(
        xyz, dc, np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.8)))),
        np.log(rng.uniform(0.004, 0.02, (n, 3)).astype(np.float32)),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[2, 4, 8, 16])
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--big", action="store_true",
                   help="use utils.synthetic.make_big_scene (reference "
                        "Mip-360 composition, small splats) instead of "
                        "the bench ball — the band-cull lever depends "
                        "on rect height vs stride, so the two scene "
                        "families bound it from both sides")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--ppg", type=float, default=12.5,
                   help="expected full-frame pairs per gaussian (bench "
                        "ball ~12.2, make_big_scene ~2.33); sizes the "
                        "per-band pair budget")
    p.add_argument("--trace", action="store_true",
                   help="xplane device self-time of the worst band")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    n = args.n
    if args.big:
        from multiview_inpaint_tpu.utils.synthetic import make_big_scene
        params = make_big_scene(n)
    else:
        params = build_scene(n)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=1920, height=1080)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    tiles_y = -(-1080 // 16)

    if args.trace:
        from bench_scale import device_stage_ms
        import tempfile
        tbase = tempfile.mkdtemp(prefix="band_cull_")

    def timeit_min(fn, iters, reps=3):
        jax.block_until_ready(fn().rgb)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn()
            jax.block_until_ready(o.rgb)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    for d in args.devices:
        band_rows = -(-tiles_y // d)
        kw = dict(sh_degree=0, backend="pallas", band_rows=band_rows,
                  band_stride=d,
                  pair_budget=max(int(1.6 * args.ppg * n / d),
                                  int(0.25 * args.ppg * n)))
        # Probe pass (cull_n = n reports active counts without culling).
        needs, acts, pairs = [], [], []
        t0 = time.time()
        for r0 in range(d):
            out = render(params, rcam, bg, band_row0=jnp.int32(r0),
                         cull_n=n, **kw)
            assert int(out.pairs) <= kw["pair_budget"], (
                r0, int(out.pairs))
            needs.append(int(out.expand_needed))
            acts.append(int(out.cull_needed))
            pairs.append(int(out.pairs))
        log(f"D={d}: probe {time.time()-t0:.0f}s acts={acts} "
            f"pairs={pairs}")
        window = max(-(-(max(needs) + 16) // 16) * 16, 32)
        cull_cap = min(-(-int(max(acts) * 1.15) // 8192) * 8192, n)

        def run_band(r0, cull):
            return lambda: render(params, rcam, bg,
                                  band_row0=jnp.int32(r0),
                                  expand_window=window,
                                  cull_n=cull, **kw)

        for cull in (None, cull_cap):
            times = []
            for r0 in range(d):
                out = run_band(r0, cull)()
                if cull is not None:
                    assert int(out.cull_needed) <= cull, r0
                assert int(out.expand_needed) <= window, r0
                times.append(timeit_min(run_band(r0, cull), args.iters))
            worst = max(times)
            med = sorted(times)[len(times) // 2]
            row = {
                "metric": "band_cull_scaling", "devices": d,
                "cull_n": cull, "band_rows": band_rows,
                "window": window,
                "worst_ms": round(worst * 1e3, 2),
                "median_ms": round(med * 1e3, 2),
                "frame_fps_projected": round(1.0 / worst, 1),
                "max_active": max(acts),
            }
            if args.trace:
                r0w = int(np.argmax(times))
                try:
                    dev, _ = device_stage_ms(
                        lambda: run_band(r0w, cull)(), args.iters,
                        f"d{d}c{cull}", tbase)
                    row["worst_device_ms"] = round(dev, 2)
                    row["frame_device_fps"] = round(1e3 / dev, 1)
                except Exception as e:  # noqa: BLE001
                    log(f"trace failed: {e!r}")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
