"""Pair-sort encodings + counting-sort costing at reference scale.

VERDICT r4 #2: at 4M gaussians the (tile, rank) lexicographic wide-key
sort is 49.1 ms of the 254 ms 1080p frame (18.8 of 119 at 2M) —
superlinear in pairs. Within-tile pair order == depth-rank order and the
slots are emitted rank-major, so the sort is exactly one stable
partition by tile; the levers measurable on this chip:

1. Encoding width (``binning.py wide_mode``): the sort is
   operand-traffic-bound, so fuse (tile, rank) into ONE u32 key when
   the bits fit (512x384 up to 2M ranks, 1080p up to 524k), else ride
   tile as an i16 operand (6 bytes/slot instead of 8). This script
   A/Bs lex vs i16 vs u32 on real frames and bit-checks the outputs.
2. Counting-sort direct placement (seg_start is already known pre-sort
   from the MXU coverage histogram): feasible iff a P-sized scatter at
   computed positions beats the sort. XLA TPU scatter cost is the
   whole question — measured here standalone at pair-budget sizes
   (unique random positions, int32 values), next to the equivalent
   gather as the locality reference.

    python -u scripts/exp_pair_sort.py [--quick]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TBASE = "/tmp/exp_pair_sort_trace"


def device_buckets(fn, iters, tag):
    """(total_device_ms, {bucket: ms}) per call via xplane; buckets ops
    whose name contains 'sort' / 'scatter' / 'gather'."""
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
    tot = 0.0
    buckets = {"sort": 0.0, "scatter": 0.0, "gather": 0.0}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            meta = plane.event_metadata
            for ev in line.events:
                ms = ev.duration_ps / 1e9
                tot += ms
                name = meta[ev.metadata_id].name.lower()
                for b in buckets:
                    if b in name:
                        buckets[b] += ms
    return tot / iters, {k: round(v / iters, 2)
                         for k, v in buckets.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="2M only, 3 iters")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene
    from scripts.exp_densify_scale import orbit_cameras

    bg = jnp.zeros(3, jnp.float32)
    it = 3 if args.quick else args.iters

    def emit(row):
        print(json.dumps(row), flush=True)

    # ---- scatter probe (the counting-sort feasibility gate) ----------
    for psz in ((5_200_000,) if args.quick else (5_200_000, 10_400_000)):
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.permutation(psz).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, 1 << 22, psz).astype(np.int32))

        @jax.jit
        def scat(pos, vals):
            return jnp.zeros(pos.shape[0], jnp.int32).at[pos].set(
                vals, unique_indices=True, mode="drop")

        @jax.jit
        def gath(pos, vals):
            return vals[pos]

        @jax.jit
        def srt(vals):
            (s,) = jax.lax.sort(
                (vals.astype(jnp.uint32),), is_stable=False)
            return s

        sc, _ = device_buckets(lambda: scat(pos, vals), it, f"sc{psz}")
        ga, _ = device_buckets(lambda: gath(pos, vals), it, f"ga{psz}")
        so, _ = device_buckets(lambda: srt(vals), it, f"so{psz}")
        emit({"probe": "scatter_vs_gather_vs_sort", "p": psz,
              "scatter_ms": round(sc, 2), "gather_ms": round(ga, 2),
              "u32_sort_ms": round(so, 2)})

    # ---- frame-level encoding A/B -------------------------------------
    cases = [("1080p", 1920, 1080, ("lex", "i16"))]
    if not args.quick:
        cases.append(("512x384", 512, 384, ("lex", "i16", "u32")))
    scales = (2_000_000,) if args.quick else (2_000_000, 4_000_000)
    for ns in scales:
        params = make_big_scene(ns)
        for label, w, h, modes in cases:
            cam = orbit_cameras(2, 3.2, w, h)[0]
            rcam = RenderCamera.from_camera(cam)
            spb = int(2.6 * ns)
            # u32 fits only when (num_tiles+1) < 2**(32-gid_bits)
            if ns >= 4_000_000 and "u32" in modes:
                modes = tuple(m for m in modes if m != "u32")
            ref = None
            for mode in modes:
                kw = dict(sh_degree=0, pair_budget=spb,
                          backend="pallas", force_wide=True,
                          wide_mode=mode)
                out = render(params, rcam, bg, **kw)
                jax.block_until_ready(out.rgb)
                if ref is None:
                    ref = out.rgb
                    same = True
                else:
                    same = bool(jnp.array_equal(out.rgb, ref))
                t0 = time.perf_counter()
                for _ in range(it):
                    o = render(params, rcam, bg, **kw)
                jax.block_until_ready(o.rgb)
                wall = (time.perf_counter() - t0) / it
                dev, bk = device_buckets(
                    lambda: render(params, rcam, bg, **kw), it,
                    f"{label}_{ns}_{mode}")
                emit({"probe": "frame", "res": label, "n": ns,
                      "pairs": int(out.pairs), "mode": mode,
                      "device_ms": round(dev, 2),
                      "sort_ms": bk["sort"],
                      "wall_ms": round(wall * 1e3, 2),
                      "bit_identical_vs_first": same})
        del params


if __name__ == "__main__":
    main()
