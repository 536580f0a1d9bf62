"""Attention microbenchmark — reference ``scripts/tests/attention.py``.

Times the pluggable attention op at the shapes the pipeline actually uses
(spatial <= 3072 tokens x 320..1280 dims, temporal 14 x 4096 batch), fwd
and fwd+bwd, on the default backend.

    python scripts/bench_attention.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multiview_inpaint_tpu.diffusion.attention_op import attention

SHAPES = [
    # (batch, q_len, kv_len, heads, dim_head, label)
    (14, 3072, 3072, 5, 64, "spatial self ds1 (64x48)"),
    (14, 768, 768, 10, 64, "spatial self ds2"),
    (14, 3072, 1, 5, 64, "spatial cross (1 clip token)"),
    (3072, 14, 14, 5, 64, "temporal self (14 frames)"),
    (16, 4096, 4096, 8, 64, "generic 4k"),
]


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}")
    for b, q_len, kv, heads, dh, label in SHAPES:
        d = heads * dh
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, q_len, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, kv, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, kv, d), jnp.bfloat16)
        fwd = jax.jit(lambda q, k, v: attention(q, k, v, heads))
        t_fwd = bench(fwd, q, k, v)

        def loss(q, k, v):
            return jnp.sum(attention(q, k, v, heads).astype(jnp.float32))

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_bwd = bench(gr, q, k, v)
        flops = 4 * b * q_len * kv * d
        print(f"{label:34s} fwd {t_fwd * 1e3:7.2f} ms "
              f"({flops / t_fwd / 1e12:5.1f} TF/s)   "
              f"fwd+bwd {t_bwd * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
