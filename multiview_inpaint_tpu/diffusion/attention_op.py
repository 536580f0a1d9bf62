"""Single pluggable attention op for the whole diffusion stack.

The reference routes every transformer block through xformers / torch SDP
CUDA kernels (``svd_inpaint1/sgm/modules/attention.py:15-55``); here there
is exactly one entry point. Long self-attention (the 3072-token spatial
blocks at ds1) runs the Pallas TPU flash-attention kernel — the XLA
lowering of ``jax.nn.dot_product_attention`` materializes the full
[B, H, T, T] logits tensor, which profiled at ~160 ms of the 592 ms SVD
guided step. Short sequences (temporal T=14, cross-attention with one
CLIP token) stay on the XLA path, where fused softmax beats a kernel
launch. On CPU (tests) everything uses the XLA path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

# Flash pays off when the materialized logits would dominate; the kernel
# needs sequence lengths divisible by its 256/512 blocks. 768 covers the
# ds2 spatial blocks, whose XLA-SDP f32 [B,H,768,768] logits were the
# largest backward temps in the full-size training step's OOM dump.
_FLASH_MIN_LEN = 768


@lru_cache(maxsize=1)
def _flash_ok():
    return jax.default_backend() != "cpu"


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              heads: int, scale: float | None = None) -> jnp.ndarray:
    """Multi-head attention over packed [B, T, H*D] tensors.

    q: [B, Tq, H*D]; k/v: [B, Tk, H*D]. Returns [B, Tq, H*D].
    """
    b, tq, hd = q.shape
    tk = k.shape[1]
    d = hd // heads
    dt = jnp.promote_types(q.dtype, k.dtype)
    qh = q.astype(dt).reshape(b, tq, heads, d)
    kh = k.astype(dt).reshape(b, tk, heads, d)
    vh = v.astype(dt).reshape(b, tk, heads, d)

    if (_flash_ok() and tq == tk and tq >= _FLASH_MIN_LEN
            and tq % 256 == 0 and d <= 128):
        from .flash_attention import flash_mha
        sm = (1.0 / d ** 0.5) if scale is None else scale
        fold = lambda x: x.transpose(0, 2, 1, 3).reshape(  # noqa: E731
            b * heads, tq, d)
        out = flash_mha(fold(qh), fold(kh), fold(vh), sm)
        out = out.reshape(b, heads, tq, d).transpose(0, 2, 1, 3)
        return out.reshape(b, tq, hd)

    out = jax.nn.dot_product_attention(qh, kh, vh, scale=scale)
    return out.reshape(b, tq, hd)
