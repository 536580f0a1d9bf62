"""Reference-scale rasterizer benchmark: multi-million-gaussian scenes.

The reference's actual workload is Mip-360 backgrounds at 1-6M
gaussians after densification (``gs-simp/scene/gaussian_model.py``
densify loop; ``inpaint_rec.py:54-58`` adds 30k seeds on TOP of such a
background). Every round-1..3 perf number in this repo lived at
100k-262k; this script measures the same 1080p render and the 512x384
train step at reference scale, where the binning switches to WIDE
(tile, rank) sort keys (packed int32 keys overflow past
2^(31 - tile_bits) gaussians — see ``binning.bin_gaussians``).

Per scale it reports: true pairs, pair budget, expansion window,
render wall ms/FPS, and (with --trace) xplane device stage times, as
one JSON line per config. Run on the real TPU:

    python -u scripts/bench_scale.py --n 2000000 --train
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_scene(n: int, seed: int = 0, **kw):
    """See multiview_inpaint_tpu.utils.synthetic.make_big_scene."""
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene
    return make_big_scene(n, seed=seed, **kw)


def device_stage_ms(fn, iters, tag, tbase, want=()):
    """Total device self-time per call via xplane; also per-op buckets
    for names containing the given substrings."""
    import jax
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    jax.block_until_ready(fn())
    d = os.path.join(tbase, tag)
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
    buckets = {w: 0.0 for w in want}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                ms = ev.duration_ps / 1e9
                tot += ms
                name = meta[ev.metadata_id].name
                for w in want:
                    if w in name:
                        buckets[w] += ms
    return tot / iters, {w: round(v / iters, 2) for w, v in buckets.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, nargs="+",
                   default=[1_000_000, 2_000_000])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", action="store_true",
                   help="xplane device stage times (adds a trace pass)")
    p.add_argument("--train", action="store_true",
                   help="also time the 512x384 GS train step per scale")
    p.add_argument("--budget_mult", type=float, default=2.6,
                   help="pair budget / N; the scale scenes measure "
                        "~2.33 pairs/gaussian, and every P-proportional "
                        "stage (gather, sort, expansion) pays the slack "
                        "— the adaptive growth loop below recovers from "
                        "an undershoot")
    p.add_argument("--cpu", action="store_true",
                   help="CPU smoke mode: interpret kernels, small frame")
    p.add_argument("--size", type=int, nargs=2, default=None,
                   help="override render width height")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    tbase = tempfile.mkdtemp(prefix="bench_scale_")
    log(f"backend={jax.default_backend()}")

    w, h = args.size or ((256, 160) if args.cpu else (1920, 1080))
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.7, width=w, height=h)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)

    for n in args.n:
        t0 = time.time()
        params = make_scene(n)
        log(f"n={n}: scene built in {time.time()-t0:.1f}s")
        pb = int(args.budget_mult * n)
        kwargs = dict(sh_degree=0, pair_budget=pb, backend="pallas",
                      interpret=args.cpu)
        t0 = time.time()
        out = render(params, rcam, bg, **kwargs)
        jax.block_until_ready(out.rgb)
        compile_s = time.time() - t0
        pairs, need = int(out.pairs), int(out.expand_needed)
        log(f"n={n}: compile+first {compile_s:.1f}s pairs={pairs} "
            f"({pairs/n:.2f}/gaussian) budget={pb} window_need={need}")
        grew = 0
        while pairs > pb:
            pb = int(pb * 2)
            kwargs["pair_budget"] = pb
            grew += 1
            out = render(params, rcam, bg, **kwargs)
            jax.block_until_ready(out.rgb)
            pairs, need = int(out.pairs), int(out.expand_needed)
            log(f"n={n}: budget grew to {pb}, pairs={pairs}")
        window = max(-(-(need + 16) // 16) * 16, 32)
        if window < 288:
            kwargs["expand_window"] = window
            out = render(params, rcam, bg, **kwargs)
            jax.block_until_ready(out.rgb)
            if int(out.expand_needed) > window:
                kwargs.pop("expand_window")

        # sanity: image not empty / not NaN
        s = float(jnp.sum(out.alpha))
        assert np.isfinite(s) and s > 0, s

        f = lambda: render(params, rcam, bg, **kwargs)  # noqa: E731
        jax.block_until_ready(f().rgb)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f()
        jax.block_until_ready(o.rgb)
        wall_ms = (time.perf_counter() - t0) / args.iters * 1e3

        row = {
            "metric": "splat_render_1080p_scale",
            "n_gaussians": n,
            "pairs": pairs,
            "pairs_per_gaussian": round(pairs / n, 2),
            "pair_budget": pb,
            "budget_regrows": grew,
            "expand_window": kwargs.get("expand_window", 288),
            "wall_ms": round(wall_ms, 2),
            "fps": round(1e3 / wall_ms, 2),
            "compile_s": round(compile_s, 1),
        }
        if args.trace:
            try:
                dev, buckets = device_stage_ms(
                    f, args.iters, f"frame{n}", tbase,
                    want=("sort", "composite_pallas", "expand",
                          "gather", "scan"))
                row["device_ms"] = round(dev, 2)
                row["device_buckets_ms"] = buckets
            except Exception as e:  # noqa: BLE001
                log(f"trace failed: {e!r}")
        print(json.dumps(row), flush=True)

        if args.train:
            _train_step_bench(params, n, args, tbase, row_extra={})


def _train_step_bench(params, n, args, tbase, row_extra):
    """512x384 GS train step (render fwd+bwd + Adam) at scale — the
    training-side half of the scale story (train_gs.py's inner step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render

    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.8, width=512, height=384)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    pb = int(3 * n)
    tx = optax.adam(1e-3)
    trainable = dict(xyz=params.xyz, features_dc=params.features_dc,
                     opacity=params.opacity, scaling=params.scaling,
                     rotation=params.rotation)
    opt_state = tx.init(trainable)
    target = jnp.zeros((384, 512, 3), jnp.float32)

    import dataclasses

    def loss_fn(tr):
        q = dataclasses.replace(params, **tr)
        out = render(q, rcam, bg, sh_degree=0, pair_budget=pb,
                     backend="pallas")
        return jnp.mean((out.rgb - target) ** 2), out.pairs

    @jax.jit
    def step(tr, opt_state):
        (loss, pairs), g = jax.value_and_grad(loss_fn, has_aux=True)(tr)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(tr, upd), opt_state, loss, pairs

    t0 = time.time()
    tr, opt_state, loss, pairs = step(trainable, opt_state)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    if int(pairs) > pb:
        log(f"train pairs {int(pairs)} > budget {pb}; skipping timing")
        return
    t0 = time.perf_counter()
    iters = max(args.iters, 5)
    for _ in range(iters):
        tr, opt_state, loss, pairs = step(tr, opt_state)
    jax.block_until_ready(loss)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({
        "metric": "gs_train_step_512x384_scale", "n_gaussians": n,
        "pairs": int(pairs), "pair_budget": pb,
        "wall_ms": round(ms, 2), "it_per_s": round(1e3 / ms, 2),
        "compile_s": round(compile_s, 1), **row_extra}), flush=True)


if __name__ == "__main__":
    main()
