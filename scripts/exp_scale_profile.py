"""Profile the at-scale render: top device ops at N=1-2M gaussians.

The first scale measurement (bench_scale.py) put only ~25% of the
device frame in the named sort/composite/expand buckets — this script
dumps the actual top-op table so the N-proportional offenders can be
attacked one by one.

    python -u scripts/exp_scale_profile.py --n 2000000
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--budget_mult", type=float, default=4.0)
    args = p.parse_args()

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene

    n = args.n
    params = make_big_scene(n)
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=1920, height=1080)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    kwargs = dict(sh_degree=0, pair_budget=int(args.budget_mult * n),
                  backend="pallas", expand_window=144)
    out = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(out.rgb)
    assert int(out.pairs) <= kwargs["pair_budget"]
    assert int(out.expand_needed) <= 144

    d = tempfile.mkdtemp(prefix="scale_prof_")
    jax.profiler.start_trace(d)
    for _ in range(args.iters):
        o = render(params, rcam, bg, **kwargs)
    jax.block_until_ready(o.rgb)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pbs = sorted(glob.glob(d + "/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    counts = defaultdict(int)
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9 / args.iters
                counts[name] += 1
    total = sum(agg.values())
    print(f"device total {total:.2f} ms/frame at n={n}", flush=True)
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ms:9.3f} ms  x{counts[name] // args.iters:<4d} "
              f"{name[:100]}", flush=True)


if __name__ == "__main__":
    main()
