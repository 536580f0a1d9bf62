"""bf16 Pallas flash attention vs reference attention (interpret mode).

The kernel replaces the XLA dot_product_attention path for >=1024-token
self-attention (diffusion/attention_op.py); the XLA path materializes
f32 [B,H,T,T] logits (5.3 GB per ds1 layer at 512x384x14) and profiled
~23 ms/layer on v5e, vs ~3-5 ms for the kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_inpaint_tpu.diffusion.flash_attention import (_ref_mha,
                                                             flash_mha)


@pytest.fixture(scope="module")
def qkv():
    bh, t, d = 3, 1024, 64
    q = jax.random.normal(jax.random.key(1), (bh, t, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(2), (bh, t, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(3), (bh, t, d), jnp.bfloat16)
    return q, k, v


def test_flash_matches_reference_values(qkv):
    q, k, v = qkv
    scale = 1.0 / 8.0
    out = flash_mha(q, k, v, scale, True)
    ref = _ref_mha(q, k, v, scale)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.02


def test_flash_gradients_match_reference(qkv):
    q, k, v = qkv
    scale = 1.0 / 8.0

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g = loss(lambda a, b, c: flash_mha(a, b, c, scale, True))
    gr = loss(lambda a, b, c: _ref_mha(a, b, c, scale))
    for a, b in zip(g, gr):
        e = np.abs(np.asarray(a, np.float32)
                   - np.asarray(b, np.float32)).max()
        assert e < 0.25  # bf16 grads


def test_flash_backward_kernel_structural():
    """Tight-tolerance check of the hand-written flash backward
    (round 3): with exactly-bf16-representable inputs the only error
    left is the p/ds bf16 casts (both paths make the p cast), so any
    missing scale factor, transposed operand, or off-by-one block
    indexing shows up far above the 3e-2 bar. Uses two k-grid steps
    (t=1024, BK=512) to cover the dq accumulator across steps."""
    bh, t, d = 2, 1024, 64
    rng = np.random.default_rng(7)
    mk = lambda s: jnp.asarray(
        rng.integers(-4, 5, (bh, t, d)).astype(np.float32) / 4.0,
        jnp.bfloat16)
    q, k, v = mk(1), mk(2), mk(3)
    scale = 1.0 / 8.0
    g = jnp.asarray(rng.integers(-4, 5, (bh, t, d)).astype(np.float32)
                    / 4.0, jnp.bfloat16)

    def run(fn):
        out, vjp = jax.vjp(lambda a, b, c: fn(a, b, c), q, k, v)
        return out, vjp(g)

    o_f, g_f = run(lambda a, b, c: flash_mha(a, b, c, scale, True))
    o_r, g_r = run(lambda a, b, c: _ref_mha(a, b, c, scale))
    assert np.abs(np.asarray(o_f, np.float32)
                  - np.asarray(o_r, np.float32)).max() < 1e-2
    for name, a, b in zip("qkv", g_f, g_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max()
        assert np.abs(a - b).max() / denom < 3e-2, name


def test_flash_256_block_path():
    """768-token shapes (the ds2 spatial blocks) use the 256-token
    block fallback (t % 512 != 0) — values and grads must still match
    the reference (round 3: these shapes were the largest f32 SDP
    logits in the full-size training step's OOM dump)."""
    bh, t, d = 2, 768, 64
    q = jax.random.normal(jax.random.key(4), (bh, t, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(5), (bh, t, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(6), (bh, t, d), jnp.bfloat16)
    scale = 1.0 / 8.0
    out = flash_mha(q, k, v, scale, True)
    ref = _ref_mha(q, k, v, scale)
    assert np.abs(np.asarray(out, np.float32)
                  - np.asarray(ref, np.float32)).max() < 0.02

    def grads(fn):
        return jax.grad(lambda a, b, c: jnp.sum(
            fn(a, b, c).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(grads(lambda a, b, c: flash_mha(a, b, c, scale,
                                                    True)),
                    grads(lambda a, b, c: _ref_mha(a, b, c, scale))):
        assert np.abs(np.asarray(a, np.float32)
                      - np.asarray(b, np.float32)).max() < 0.25


def test_attention_op_short_seq_stays_xla():
    """Temporal/cross shapes (short seq) route through the XLA path on
    any backend — flash requires T multiple of 512."""
    from multiview_inpaint_tpu.diffusion.attention_op import attention
    q = jax.random.normal(jax.random.key(0), (4, 14, 320))
    out = attention(q, q, q, heads=5)
    assert out.shape == (4, 14, 320)
    assert np.isfinite(np.asarray(out)).all()
