"""Single pluggable attention op for the whole diffusion stack.

The reference routes every transformer block through xformers / torch SDP
CUDA kernels (``svd_inpaint1/sgm/modules/attention.py:15-55``); here there
is exactly one entry point backed by ``jax.nn.dot_product_attention``,
which XLA lowers to the TPU flash-attention kernel when profitable. Shapes
are modest in this pipeline (spatial <= 3072 tokens, temporal 14), so the
fused path is already near roofline; a hand-written Pallas flash kernel can
be slotted in here without touching any model code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              heads: int, scale: float | None = None) -> jnp.ndarray:
    """Multi-head attention over packed [B, T, H*D] tensors.

    q: [B, Tq, H*D]; k/v: [B, Tk, H*D]. Returns [B, Tq, H*D].
    """
    b, tq, hd = q.shape
    d = hd // heads
    dt = jnp.promote_types(q.dtype, k.dtype)
    qh = q.astype(dt).reshape(b, tq, heads, d)
    kh = k.astype(dt).reshape(b, k.shape[1], heads, d)
    vh = v.astype(dt).reshape(b, v.shape[1], heads, d)
    out = jax.nn.dot_product_attention(qh, kh, vh, scale=scale)
    return out.reshape(b, tq, hd)
