"""EXPERIMENT: measured VPU elementwise ceiling on this chip.

The composite kernel is VPU-bound (~14% MXU), so the roofline that
matters for it is the vector unit's sustained elementwise rate, not
matmul TFLOP/s. Measures it the same way bench.py measures the MXU/HBM
ceilings: K dependent fma passes fused into ONE kernel over a buffer
big enough to amortize its HBM traffic, timed as a pipelined loop net
of the null dispatch.

    elems * K fma / (t - t_disp)  ->  fma/s (1 fma = 1 mul + 1 add)

K=64 unrolled fmas per element at 16M f32 elements: 128 MB HBM traffic
(~0.25 ms at ceiling) vs ~1 ms of compute if the VPU sustains ~1 Tfma/s
— compute-bound by 4x. Also reports a transcendental chain (exp) for
the EUP rate.

    python -u scripts/exp_vpu_ceiling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("EXP_INTERPRET") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    import glob
    import shutil

    def xplane_total_ms(trace_dir):
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb",
                               recursive=True))
        xs = xplane_pb2.XSpace()
        with open(pbs[-1], "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            for line in plane.lines:
                if line.name == "XLA Ops":
                    return sum(ev.duration_ps for ev in line.events) / 1e9
        return float("nan")

    def timeit(fn, *args, iters=10, tag="t"):
        """Device time per call via xplane — wall-clock
        block_until_ready reads ~0 for these single-op chains under
        axon (the known lie; see CLAUDE.md), so profile instead."""
        jax.block_until_ready(fn(*args))
        d = f"/tmp/vpu_ceiling_trace_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        jax.profiler.start_trace(d)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        return xplane_total_ms(d) / iters / 1e3  # seconds

    t_disp = 0.0  # xplane reports device self-time; no dispatch bias

    # Two measurement traps, both hit and fixed here: (a) a single
    # fused op chain reads ~0 wall-clock under axon (the known
    # block_until_ready lie) -> all timing comes from xplane; (b) a
    # repeated AFFINE chain y*c+d is algebraically collapsed by XLA
    # (k=32 and k=128 measured identical 0.935 ms) -> the chain is
    # y = y*y*1e-10 + 0.5 (squaring cannot be composed away; value
    # converges to a stable fixed point ~0.5). 2 vector ops per step
    # (mul + fma). Each fori_loop pass is unrolled K_INNER deep so it
    # is compute-dominated over its 128 MB of HBM traffic.
    n = 16 * 1024 * 1024
    x = jnp.full((n,), 1.0000001, jnp.float32)
    passes = 16

    for k_inner in (32, 128):

        @jax.jit
        def fma_chain(x, k=k_inner):
            def body(_, y):
                for _ in range(k):
                    y = y * y * 1e-10 + 0.5
                return y
            return jax.lax.fori_loop(0, passes, body, x)

        t = timeit(fma_chain, x, iters=10, tag=f"fma{k_inner}")
        rate = n * 2 * k_inner * passes / max(t - t_disp, 1e-9)
        print(f"sq chain k={k_inner:4d}: {t * 1e3:8.3f} ms  "
              f"{rate / 1e12:6.3f} Tops/s (mul+fma)", flush=True)

    # Independent chains: 8 parallel accumulators per element break the
    # per-element serial dependency so issue slots, not latency, bind.
    @jax.jit
    def fma_par(x):
        def body(_, ys):
            for _ in range(16):
                ys = tuple(y * y * 1e-10 + 0.5 for y in ys)
            return ys
        ys = tuple(x * (1.0 + i * 1e-9) for i in range(8))
        ys = jax.lax.fori_loop(0, passes, body, ys)
        out = ys[0]
        for y in ys[1:]:
            out = out + y
        return out

    t = timeit(fma_par, x, iters=10, tag="par")
    rate = n * 2 * 16 * 8 * passes / max(t - t_disp, 1e-9)
    print(f"sq 8x16-par chain: {t * 1e3:8.3f} ms  "
          f"{rate / 1e12:6.3f} Tops/s  (8 indep chains, 16 sq/pass)",
          flush=True)

    @jax.jit
    def exp_chain(x):
        def body(_, y):
            for _ in range(32):
                y = jnp.exp(y * 1e-6)
            return y
        return jax.lax.fori_loop(0, passes, body, x)

    t = timeit(exp_chain, x, iters=10, tag="exp")
    rate = n * 32 * passes / max(t - t_disp, 1e-9)
    print(f"exp chain k=32 (+mul): {t * 1e3:8.3f} ms  "
          f"{rate / 1e12:6.3f} Texp/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
