"""bf16 Pallas TPU flash attention (non-causal, no mask).

Why not XLA or the stock kernel (both profiled on the SVD guided step,
512x384x14 frames, CFG-doubled batch 28):
- ``jax.nn.dot_product_attention`` materializes the f32 [B,H,T,T]
  logits: at T=3072 that is 5.3 GB per layer — HBM-bound at ~23 ms per
  spatial block, ~160 ms of the 592 ms step.
- ``jax.experimental.pallas.ops.tpu.flash_attention`` upcasts to f32
  (6-pass MXU matmuls): 42 ms per layer — worse.

This kernel keeps q/k/v in bf16 (f32 accumulation + f32 online
softmax), streams k/v blocks from VMEM, and materializes only a
[BQ, BK] tile of logits. ~1.7 GMAC-equivalent per ds1 layer -> ~3-5 ms.

Backward: flash backward kernels are deliberately NOT hand-written yet;
``flash_mha`` carries a custom VJP that recomputes standard attention
under ``jax.vjp`` (paying the XLA logits cost on the training path
only). Inference — the reference pipeline's hot path — never touches
it.

Replaces: xformers/torch-SDP routing in the reference
(``svd_inpaint1/sgm/modules/attention.py:15-55``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512   # query block (rows per grid step)
BK = 512   # key/value block (inner-loop tile)
NEG = -1e30


def _kernel(scale, t, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                                  # [BQ, D] bf16
    d = q.shape[-1]
    nk = t // BK

    def body(i, carry):
        acc, m, denom = carry
        kc = k_ref[0, pl.ds(i * BK, BK), :]       # [BK, D] bf16
        vc = v_ref[0, pl.ds(i * BK, BK), :]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK] f32
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                    # [BQ, BK] f32
        corr = jnp.exp(m - m_new)                 # [BQ, 1]
        denom = denom * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [BQ, D] f32
        acc = acc * corr + pv
        return acc, m_new, denom

    acc = jnp.zeros((BQ, d), jnp.float32)
    m = jnp.full((BQ, 1), NEG, jnp.float32)
    denom = jnp.zeros((BQ, 1), jnp.float32)
    acc, m, denom = jax.lax.fori_loop(0, nk, body, (acc, m, denom))
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, scale, interpret):
    """q/k/v [BH, T, D] bf16 -> [BH, T, D]."""
    bh, t, d = q.shape
    grid = (bh, t // BQ)
    out = pl.pallas_call(
        functools.partial(_kernel, scale, t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out


def _ref_mha(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale: float, interpret: bool = False):
    """Batched multi-head attention, [BH, T, D] bf16/f32 inputs.

    T must be a multiple of 512; D <= 128. Forward = the bf16 Pallas
    kernel; backward recomputes standard attention (see module
    docstring).
    """
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _flash_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _ref_mha(a, b, c, scale), q, k, v)
    return vjp(g)


flash_mha.defvjp(_fwd, _bwd)
