"""EXPERIMENT: backward cotangent regroup-gather transport variants.

The train-step profile shows the [P,48] bf16 3-term regroup gather at
5.6 ns/row — 2.9x the measured bf16 row rate (1.95 ns/row at <=128
lanes), and WORSE than the f32 512-B-transaction model would predict
for a plain [P,16] f32 gather (4.67 ns/row). Measures the isolated
variants at train-step scale (P=671104 random permutation) by xplane
device time (wall-clock lies for these graphs under axon):

  f32_16    plain f32 [P,16] gather of the cotangent rows
  bf16_48   current: 3-term mask split -> [P,48] bf16 gather -> sum
  bf16_32   2-term split -> [P,32] (grad fidelity ~2^-17 — measure
            only; adoption would need tolerance review)

    python -u scripts/exp_regroup_gather.py
"""

import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    import jax
    import jax.numpy as jnp

    from multiview_inpaint_tpu.ops.rasterizer.bf16_transport import (
        _mask_split)
    from multiview_inpaint_tpu.ops.rasterizer.segment_reduce import (
        safe_gather)

    def device_ms(fn, *args, iters=10, tag="t"):
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        jax.block_until_ready(fn(*args))
        d = f"/tmp/regroup_trace_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        jax.profiler.start_trace(d)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        pbs = sorted(glob.glob(d + "/**/*.xplane.pb", recursive=True))
        xs = xplane_pb2.XSpace()
        with open(pbs[-1], "rb") as f:
            xs.ParseFromString(f.read())
        tot = 0.0
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name == "XLA Ops":
                    tot += sum(ev.duration_ps for ev in line.events)
        return tot / 1e9 / iters

    p = 671104
    nrows = 16
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(0, 1e-3, (nrows, p)).astype(np.float32))
    pos_s = jnp.asarray(rng.permutation(p).astype(np.int32))

    @jax.jit
    def f32_16(d, pos_s):
        return safe_gather(d.T, pos_s)

    @jax.jit
    def bf16_48(d, pos_s):
        t0, t1, t2 = _mask_split(d, 3)
        d_bf = jnp.concatenate([t0, t1, t2], axis=0)
        gg_bf = safe_gather(d_bf.T, pos_s)
        return (gg_bf[:, 0:nrows].astype(jnp.float32)
                + gg_bf[:, nrows:2 * nrows].astype(jnp.float32)
                + gg_bf[:, 2 * nrows:3 * nrows].astype(jnp.float32))

    @jax.jit
    def bf16_32(d, pos_s):
        t0, t1 = _mask_split(d, 2)
        d_bf = jnp.concatenate([t0, t1], axis=0)
        gg_bf = safe_gather(d_bf.T, pos_s)
        return (gg_bf[:, 0:nrows].astype(jnp.float32)
                + gg_bf[:, nrows:2 * nrows].astype(jnp.float32))

    ref = jax.block_until_ready(f32_16(d, pos_s))
    for name, fn in (("f32_16", f32_16), ("bf16_48", bf16_48),
                     ("bf16_32", bf16_32)):
        out = jax.block_until_ready(fn(d, pos_s))
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        t = device_ms(fn, d, pos_s, tag=name)
        print(f"{name:8s}: {t:8.3f} ms  {t / p * 1e6:6.2f} ns/row  "
              f"rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
