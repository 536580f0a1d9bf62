"""Per-band GS TRAIN step device time: the multi-chip training bound.

``parallel/gs_band_train.band_train_step`` shards one frame's
forward+backward into interleaved bands (dryrun-gated == single-device
up to f32 order). Real multi-chip hardware is absent here, so — like
the round-3 render bands — the honest projection is the WORST BAND's
single-chip device self-time: each device of a D-mesh runs exactly this
per-band graph (render band fwd+bwd + full-capacity Adam), plus one
[~N,16]-scale grad psum the projection EXCLUDES (noted in the output;
at 512x384 scales it is a few ms of ICI).

The per-device graph timed here: render the band with means2d_offset,
L1+SSIM on the band's own pixels (the stitched-frame loss costs the
same FLOPs; loss is <1% of the step), grads to all 6 fields + offset,
grouped Adam. With ``--cull`` the band's depth-rank compaction
truncates to the probed active count (the N-stage lever; PERF.md
band-cull curve).

    python -u scripts/exp_band_train_time.py --n 2000000 --devices 8
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--budget_mult", type=float, default=2.6,
                   help="full-frame pairs / N; per-band budget divides "
                        "by D with slack")
    p.add_argument("--zero", action="store_true",
                   help="also time the ZeRO-sharded per-device graph "
                        "(Adam on cap/D rows; parallel/gs_band_train "
                        "zero_sharded=True) and model its collectives")
    p.add_argument("--ici_gbps", type=float, default=45.0,
                   help="assumed per-device ICI bandwidth (GB/s) for "
                        "the comm MODEL (ring reduce-scatter + "
                        "all-gather); v5e ~45, v5p ~90+ per the "
                        "public per-link rates — a model, not a "
                        "measurement (no multi-chip hardware here)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.gs.cameras import make_camera
    from multiview_inpaint_tpu.gs.gaussians import GaussianParams
    from multiview_inpaint_tpu.models.gs_trainer import (
        _FIELDS, OptimizationConfig, _group_lrs)
    from multiview_inpaint_tpu.ops.rasterizer import RenderCamera, render
    from multiview_inpaint_tpu.utils import losses as loss_utils
    from multiview_inpaint_tpu.utils.synthetic import make_big_scene

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_scale import device_stage_ms
    import tempfile
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    tbase = tempfile.mkdtemp(prefix="band_train_")

    n, d = args.n, args.devices
    params = make_big_scene(n)
    cap = params.capacity
    cam = make_camera(0, np.eye(3), np.array([0.0, 0.0, 3.0]),
                      fovx=1.1, fovy=0.8, width=512, height=384)
    rcam = RenderCamera.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    tile_h = 16
    tiles_y = -(-384 // tile_h)
    band_rows = -(-tiles_y // d)
    pb = max(int(args.budget_mult * n / (d / 2.0)), n // 2)
    cfg = OptimizationConfig()
    gt = jnp.asarray(np.random.default_rng(3).random(
        (band_rows * tile_h, 512, 3)).astype(np.float32))

    mu = {f: jnp.zeros_like(getattr(params, f)) for f in _FIELDS}
    nu = {f: jnp.zeros_like(getattr(params, f)) for f in _FIELDS}

    def make_step(cull, zero=False):
        # zero=True times the ZeRO per-device graph: identical render
        # fwd+bwd (the band needs FULL params after the all-gather),
        # but Adam touches only this device's cap/D contiguous shard
        # (gs_band_train zero_sharded=True semantics; shard 0 is
        # representative — every shard is the same contiguous slice
        # cost). The reduce-scatter/all-gather are modeled separately.
        s = cap // d

        def step(fields, mu, nu, row0):
            def loss_fn(fields, offset):
                q = GaussianParams(live=params.live, **fields)
                out = render(q, rcam, bg, sh_degree=0,
                             means2d_offset=offset, pair_budget=pb,
                             backend="pallas", band_rows=band_rows,
                             band_row0=row0, band_stride=d,
                             cull_n=cull)
                pred = jnp.transpose(out.rgb, (2, 0, 1))
                gtc = jnp.transpose(gt, (2, 0, 1))
                l1 = loss_utils.l1_loss(pred, gtc)
                loss = (0.8 * l1
                        + 0.2 * (1.0 - loss_utils.ssim(pred, gtc)))
                return loss, (out.pairs, out.cull_needed,
                              out.expand_needed)
            offset = jnp.zeros((cap, 2), jnp.float32)
            ((loss, aux), (g, g_off)) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(fields, offset)
            lrs = _group_lrs(cfg, jnp.int32(10), 1.0)
            new_f, new_mu, new_nu = {}, {}, {}
            for f in _FIELDS:
                if zero:
                    gs_ = g[f][:s]
                    m = 0.9 * mu[f][:s] + 0.1 * gs_
                    v = 0.999 * nu[f][:s] + 0.001 * gs_ * gs_
                    upd = (fields[f][:s]
                           - lrs[f] * m / (jnp.sqrt(v) + 1e-15))
                    new_f[f] = fields[f].at[:s].set(upd)
                    new_mu[f] = mu[f].at[:s].set(m)
                    new_nu[f] = nu[f].at[:s].set(v)
                else:
                    m = 0.9 * mu[f] + 0.1 * g[f]
                    v = 0.999 * nu[f] + 0.001 * g[f] * g[f]
                    new_f[f] = (fields[f]
                                - lrs[f] * m / (jnp.sqrt(v) + 1e-15))
                    new_mu[f], new_nu[f] = m, v
            return new_f, new_mu, new_nu, loss, aux
        return jax.jit(step)

    fields = {f: getattr(params, f) for f in _FIELDS}

    # Probe: per-band active counts + window needs (cull_n=cap reports
    # the active count without culling anything).
    step0 = make_step(cap)
    acts, needs, pairs = [], [], []
    for r0 in range(d):
        out = step0(fields, mu, nu, jnp.int32(r0))
        jax.block_until_ready(out[3])
        pr, act, need = (int(out[4][0]), int(out[4][1]), int(out[4][2]))
        assert pr <= pb, (r0, pr, pb)
        acts.append(act)
        needs.append(need)
        pairs.append(pr)
    log(f"D={d}: acts={acts} pairs={pairs} needs={max(needs)}")
    cull_cap = min(-(-int(max(acts) * 1.15) // 8192) * 8192, cap)

    for cull in (None, cull_cap):
        step = make_step(cull)
        times = []
        for r0 in range(d):
            f = lambda r0=r0: step(fields, mu, nu, jnp.int32(r0))[3]
            jax.block_until_ready(f())
            dev, _ = device_stage_ms(f, args.iters,
                                     f"c{cull}r{r0}", tbase)
            times.append(dev)
        worst = max(times)
        print(json.dumps({
            "metric": "band_train_step_scaling", "n_gaussians": n,
            "devices": d, "cull_n": cull,
            "worst_band_device_ms": round(worst, 2),
            "median_band_device_ms": round(
                sorted(times)[len(times) // 2], 2),
            "projected_multichip_it_per_s": round(1e3 / worst, 2),
            "note": ("projection excludes the grad psum "
                     "(~112MB over ICI at 2M) and assumes the "
                     "replicated Adam overlaps nothing"),
        }), flush=True)
        base_worst = worst   # last loop iter = culled replicated step

    if args.zero:
        # ZeRO per-device graph (gs_band_train zero_sharded=True): same
        # band fwd+bwd, Adam on a cap/D shard, then modeled collectives.
        # Comm model (ring, ICI): replicated psum moves
        # 2*(D-1)/D * grad_bytes per device; ZeRO moves
        # (D-1)/D * grad_bytes (reduce-scatter) +
        # (D-1)/D * param_bytes (all-gather) — the SAME wire bytes.
        # ZeRO's win is Adam compute / optimizer+grad memory / D.
        row_f = {f: int(np.prod(getattr(params, f).shape[1:]))
                 for f in _FIELDS}
        param_bytes = sum(row_f.values()) * 4 * cap
        grad_bytes = param_bytes + 2 * 4 * cap          # + offset grad
        bw = args.ici_gbps * 1e9
        psum_ms = 2 * (d - 1) / d * grad_bytes / bw * 1e3
        zero_ms = ((d - 1) / d * (grad_bytes + param_bytes)
                   / bw * 1e3)
        zstep = make_step(cull_cap, zero=True)
        times = []
        for r0 in range(d):
            f = lambda r0=r0: zstep(fields, mu, nu, jnp.int32(r0))[3]
            jax.block_until_ready(f())
            dev, _ = device_stage_ms(f, args.iters, f"z{r0}", tbase)
            times.append(dev)
        zworst = max(times)
        print(json.dumps({
            "metric": "band_train_step_zero", "n_gaussians": n,
            "devices": d, "cull_n": cull_cap,
            "worst_band_device_ms": round(zworst, 2),
            "median_band_device_ms": round(
                sorted(times)[len(times) // 2], 2),
            "adam_ms_saved_vs_replicated": round(base_worst - zworst, 2),
            "comm_model": {
                "ici_gbps_assumed": args.ici_gbps,
                "zero_rs_ag_ms": round(zero_ms, 2),
                "replicated_psum_ms": round(psum_ms, 2),
                "grad_mb": round(grad_bytes / 1e6, 1),
            },
            "projected_it_per_s_incl_comm": round(
                1e3 / (zworst + zero_ms), 2),
            "replicated_projected_it_per_s_incl_comm": round(
                1e3 / (base_worst + psum_ms), 2),
            "optimizer_state_bytes_per_device": int(
                2 * param_bytes / d),
            "note": ("comm is a MODEL at the stated ICI GB/s (ring "
                     "collectives, no overlap assumed) — no multi-chip "
                     "hardware in this container; per-device compute is "
                     "xplane device self-time of the real per-shard "
                     "graph (equality vs single-device is gated by "
                     "tests/test_gs_band_train.py zero tests + dryrun)"),
        }), flush=True)


if __name__ == "__main__":
    main()
