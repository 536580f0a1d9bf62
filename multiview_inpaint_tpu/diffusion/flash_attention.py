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

Backward (round 3): a hand-written single-pass Pallas kernel — grid
over k/v blocks, dk/dv written per block, dq accumulated across grid
steps in a resident full-T VMEM block (the TPU grid is sequential, so
the (b, 0, 0)-indexed output block is a race-free accumulator). Five
MXU matmuls per (q, k) tile — s, dp, dv, dk, dq — the flash-backward
optimum; softmax stats ride the forward's saved logsumexp instead of a
recompute. The lse/delta residuals use the lane-broadcast
[BH, T, 128] layout (q rows in sublanes — no in-kernel transposes),
the same trick as the stock jax TPU kernel. The forward compiles a
separate no-residual variant so inference never pays the lse write.

Replaces: xformers/torch-SDP routing in the reference
(``svd_inpaint1/sgm/modules/attention.py:15-55``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512   # preferred query block (rows per grid step)
BK = 512   # preferred key/value block (inner-loop tile)
NEG = -1e30
LANES = 128  # lane-broadcast width for softmax-stat residuals


def _blocks(t: int) -> int:
    """Largest supported block size dividing t (512 preferred; 256
    covers the 768-token ds2 spatial shapes — the block A/B measured
    <10% spread over 256-1024, so smaller blocks cost little)."""
    for b in (BQ, 256):
        if t % b == 0:
            return b
    raise ValueError(f"flash_mha: T={t} not a multiple of 256")


def _kernel(scale, t, bq, bk, save_lse, q_ref, k_ref, v_ref, o_ref,
            lse_ref=None):
    q = q_ref[0]                                  # [bq, D] bf16
    d = q.shape[-1]
    nk = t // bk

    def body(i, carry):
        acc, m, denom = carry
        kc = k_ref[0, pl.ds(i * bk, bk), :]       # [bk, D] bf16
        vc = v_ref[0, pl.ds(i * bk, bk), :]
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

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG, jnp.float32)
    denom = jnp.zeros((bq, 1), jnp.float32)
    acc, m, denom = jax.lax.fori_loop(0, nk, body, (acc, m, denom))
    o_ref[0] = (acc / denom).astype(o_ref.dtype)
    if save_lse:
        # Row logsumexp in the lane-broadcast [bq, 128] layout (q rows
        # stay in sublanes — no transpose; same trick as the stock jax
        # TPU kernel's l/m refs).
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(denom), (bq, LANES))


def _flash_fwd_impl(q, k, v, scale, interpret, save_lse=False):
    """q/k/v [BH, T, D] bf16 -> [BH, T, D] (+ lse [BH, T, 128] f32)."""
    bh, t, d = q.shape
    bq = bk = _blocks(t)
    grid = (bh, t // bq)
    out_specs = pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, t, d), q.dtype)
    if save_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, bq, LANES), lambda b, i: (b, i, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bh, t, LANES), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, scale, t, bq, bk, save_lse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v)
    return out


def _bwd_kernel(scale, t, bq, bk, q_ref, do_ref, k_ref, v_ref, lse_ref,
                dlt_ref, dq_ref, dk_ref, dv_ref):
    """One k/v block per grid step; dq accumulates across steps.

    dq_ref's index map pins the same (b, 0, 0) block for every k step of
    a batch row, so it lives in VMEM as a race-free accumulator (the TPU
    grid is sequential) and is written back once per batch row.
    """
    kb = pl.program_id(1)
    kc = k_ref[0]                                  # [bk, D] bf16
    vc = v_ref[0]
    d = kc.shape[-1]
    nq = t // bq

    @pl.when(kb == 0)
    def _():
        dq_ref[0] = jnp.zeros((t, d), jnp.float32)

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(j * bq, bq), :]         # [bq, D] bf16
        do = do_ref[0, pl.ds(j * bq, bq), :]
        lse = lse_ref[0, pl.ds(j * bq, bq), :]     # [bq, 128] f32
        dlt = dlt_ref[0, pl.ds(j * bq, bq), :]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, bk]
        p = jnp.exp(s - jnp.tile(lse, (1, bk // LANES)))
        pb = p.astype(jnp.bfloat16)
        # dV += P^T dO  (contract over q rows)
        dv_acc += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [bk, D]
        # dP = dO V^T ; dS = P * (dP - delta) * scale
        dp = jax.lax.dot_general(
            do, vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [bq, bk]
        ds = (p * (dp - jnp.tile(dlt, (1, bk // LANES)))
              * scale).astype(jnp.bfloat16)
        # dK += dS^T Q (contract over q rows); dQ_j += dS K
        dk_acc += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [bk, D]
        dq_ref[0, pl.ds(j * bq, bq), :] += jax.lax.dot_general(
            ds, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [bq, D]
        return dk_acc, dv_acc

    dk_acc = jnp.zeros((bk, d), jnp.float32)
    dv_acc = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (dk_acc, dv_acc))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g, scale, interpret):
    """Returns (dq, dk, dv), same shape/dtype as q/k/v."""
    bh, t, d = q.shape
    # delta_i = rowsum(dO * O), f32, lane-broadcast like lse.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                       # [BH, T]
    delta = jnp.broadcast_to(delta[:, :, None], (bh, t, LANES))
    g = g.astype(q.dtype)
    bq = bk = _blocks(t)
    grid = (bh, t // bk)
    full = pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0))
    kblk = pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0))
    stat = pl.BlockSpec((1, t, LANES), lambda b, i: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale, t, bq, bk),
        grid=grid,
        in_specs=[full, full, kblk, kblk, stat, stat],
        out_specs=(pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
                   kblk, kblk),
        out_shape=(jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, t, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), q.dtype)),
        interpret=interpret,
    )(q, g, k, v, lse, delta)
    return dq.astype(q.dtype), dk, dv


def _ref_mha(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale: float, interpret: bool = False):
    """Batched multi-head attention, [BH, T, D] bf16/f32 inputs.

    T must be a multiple of 256; D <= 128. Forward = the bf16 Pallas
    kernel; backward = the single-pass Pallas flash backward (see
    module docstring).
    """
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    o, lse = _flash_fwd_impl(q, k, v, scale, interpret, save_lse=True)
    return o, (q, k, v, o, lse)


def _bwd(scale, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, interpret)


flash_mha.defvjp(_fwd, _bwd)
