"""bf16-split transport for the rasterizer's big row gathers.

Measured on v5e (loop-carried chains under the profiler): an XLA row
gather costs the same for 16..128 f32 lanes — the unit is the
lane-padded 512 B row transaction — while a bf16 table's rows are 256 B
and gather 2.4x faster (1.95 vs 4.68 ns/row). The f32 attribute tables
therefore waste 7/8 of every transaction.

This module moves the pallas path's two P-sized gathers (the pair
attribute gather and the backward cotangent regroup) and the N-sized
permutation gather onto bf16 tables that carry each f32 value as an
EXACT multi-term split:

    x = t0 + t1 + ... + t_{k-1},   t_i = bf16

built with integer bit-masks (top-16-bit truncation + exact Sterbenz
remainders). Masks, not ``x - bf16(x)`` arithmetic: XLA-TPU compiles
with excess precision allowed and folds bf16 round-trips to identity
(the pair-expansion kernel hit exactly this on hardware — see
``pair_expand._bf16_mask_split``). Term counts per column are chosen so
reconstruction is f32-exact where decisions depend on it (4 terms for
pixel coordinates, 3 for conic/opacity) and well inside test tolerance
elsewhere (2 for colors/depth/gate: 2^-17 relative).

``pair_attrs_bf16`` is the differentiable unit spanning
split -> permute -> pair-gather -> reconstruct with f32 input/output
semantics: its VJP reduces pair cotangents to per-gaussian gradients in
f32 (3-term bf16 transport for the regroup gather only; all summation
stays f32), so gradient fidelity matches the plain-f32 path to ~2^-24.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .segment_reduce import _blocked_cumsum_f32, safe_gather

# Packed-column term counts (pallas_composite.pack_attrs layout:
# mx, my, ca, cb, cc, op, r, g, b, depth, gate; cols 11-15 are zero and
# are not transported at all).
PACK_TERMS: Tuple[int, ...] = (4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2)
N_PACK_COLS = 16  # kernel-facing row count (NROWS)
COT_TERMS = 3     # uniform per-row terms for the cotangent transport


def _mask_split(x: jnp.ndarray, terms: int) -> list[jnp.ndarray]:
    """Exact multi-term bf16 split of f32 ``x`` via top-16-bit
    truncation; every term but the last is exact, the last rounds
    (error <= 2^-(8*terms-?) relative — 4 terms reconstruct f32
    exactly)."""
    out = []
    r = x
    for _ in range(terms - 1):
        bits = jax.lax.bitcast_convert_type(r, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32)
        out.append(hi.astype(jnp.bfloat16))  # exact: hi IS a bf16 value
        r = r - hi                           # exact (Sterbenz)
    out.append(r.astype(jnp.bfloat16))
    return out


def split_columns(cols: Sequence[jnp.ndarray],
                  terms: Sequence[int]) -> jnp.ndarray:
    """[N] f32 columns -> [N, sum(terms)] bf16 split table, TERM-MAJOR:
    lane block k holds term k of every column that has one. ``terms``
    must be non-increasing so each block is a column PREFIX — that
    makes reconstruction a handful of whole-block sublane adds instead
    of per-row slicing+stacking (which lowers to one [1, P] fusion per
    row and cost 25 ms/step on hardware)."""
    assert all(terms[i] >= terms[i + 1] for i in range(len(terms) - 1))
    per_col = [_mask_split(c, t) for c, t in zip(cols, terms)]
    lanes = []
    for k in range(max(terms)):
        for pc, t in zip(per_col, terms):
            if k < t:
                lanes.append(pc[k])
    return jnp.stack(lanes, axis=1)


def reconstruct_rows(bf_t: jnp.ndarray, terms: Sequence[int],
                     out_rows: int) -> jnp.ndarray:
    """Term-major [L, P] bf16 (split lanes in sublanes) ->
    [out_rows, P] f32 via prefix-block adds."""
    ncols = len(terms)
    p = bf_t.shape[1]
    acc = bf_t[0:ncols].astype(jnp.float32)
    off = ncols
    for k in range(1, max(terms)):
        cnt = sum(1 for t in terms if t > k)
        acc = jnp.concatenate(
            [acc[0:cnt] + bf_t[off:off + cnt].astype(jnp.float32),
             acc[cnt:]], axis=0)
        off += cnt
    if out_rows > ncols:
        acc = jnp.concatenate(
            [acc, jnp.zeros((out_rows - ncols, p), jnp.float32)], axis=0)
    return acc


@jax.custom_vjp
def pair_attrs_bf16(packed: jnp.ndarray, order: jnp.ndarray,
                    gid: jnp.ndarray, rank_lo: jnp.ndarray
                    ) -> jnp.ndarray:
    """Depth-rank-permute + pair-gather of the packed attribute table
    with bf16 transport; returns the kernel-ready [NROWS, P] f32 array.

    packed [N, 16] f32 (pack_attrs layout); order [M] depth argsort —
    the FULL permutation (M == N) or a ``cull_n`` prefix of it (M < N,
    per-band N-culling: only the first M depth ranks participate);
    gid [P] rank-space ids with sentinel M for padding; rank_lo [M+2]
    segment starts in id-sorted pair order (see
    ``segment_reduce.gather_pairs``).
    """
    out, _ = _pab_fwd(packed, order, gid, rank_lo)
    return out


def _split_table(packed: jnp.ndarray) -> jnp.ndarray:
    cols = [packed[:, i] for i in range(len(PACK_TERMS))]
    return split_columns(cols, PACK_TERMS)


def _pab_fwd(packed, order, gid, rank_lo):
    split_bf = _split_table(packed)                 # [N, 30] bf16
    sorted_bf = safe_gather(split_bf, order)        # rank order
    lanes = sorted_bf.shape[1]
    sorted_bf = jnp.concatenate(
        [sorted_bf, jnp.zeros((1, lanes), jnp.bfloat16)])  # sentinel
    pairs_bf = safe_gather(sorted_bf, gid)          # [P, 30] bf16
    attrs_t = reconstruct_rows(pairs_bf.T, PACK_TERMS, N_PACK_COLS)
    return attrs_t, (order, gid, rank_lo, packed.shape[0])


def _pab_bwd(res, d):
    """d [NROWS, P] f32 -> d_packed [N, 16] f32 (f32-fidelity segment
    reduction; bf16 transport only for the latency-bound regroup
    gather)."""
    order, gid, rank_lo, n = res
    m = order.shape[0]          # rank-space size (== n unless culled)
    nrows, p = d.shape
    # TERM-MAJOR vectorized 3-term split: whole-array mask ops on
    # [NROWS, P] (a per-row python loop + stack lowered to 48 separate
    # [1, P] column-major fusions — 25 ms/step on hardware).
    t0, t1, t2 = _mask_split(d, COT_TERMS)          # each [16, P] bf16
    d_bf = jnp.concatenate([t0, t1, t2], axis=0)    # [48, P]
    pos = jnp.arange(p, dtype=jnp.int32)
    gid_s, pos_s = jax.lax.sort((gid, pos), num_keys=1)
    gg_bf = safe_gather(d_bf.T, pos_s)              # [P, 48] grouped
    gg = (gg_bf[:, 0:nrows].astype(jnp.float32)
          + gg_bf[:, nrows:2 * nrows].astype(jnp.float32)
          + gg_bf[:, 2 * nrows:3 * nrows].astype(jnp.float32))
    # Sentinel-id slots (padding) must not ride the prefix.
    gg = jnp.where((gid_s < m)[:, None], gg, 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((1, nrows), jnp.float32), _blocked_cumsum_f32(gg)])
    ends = cum[rank_lo]                             # [M+2, 16]
    d_rank = ends[1:] - ends[:-1]                   # [M+1, 16]
    d_rank = d_rank[:m]                             # drop sentinel row
    if m == n:
        d_packed = safe_gather(d_rank, jnp.argsort(order))
    else:
        # Culled rank space: ``order`` is a prefix, not a permutation.
        # A direct .at[order].set row scatter serializes per row on TPU;
        # instead sort the M (target, rank) pairs and align them to the
        # full id range with a searchsorted — sort + two gathers, all
        # fast primitives. Culled gaussians contributed no pixels, so
        # their grad is zero.
        ids = jnp.arange(n, dtype=jnp.int32)
        tgt_s, rank_s = jax.lax.sort(
            (order.astype(jnp.int32), jnp.arange(m, dtype=jnp.int32)),
            num_keys=1)
        pos = jnp.minimum(jnp.searchsorted(tgt_s, ids), m - 1)
        hit = tgt_s[pos] == ids
        d_packed = jnp.where(hit[:, None],
                             safe_gather(d_rank, rank_s[pos]), 0.0)
    return d_packed, None, None, None


pair_attrs_bf16.defvjp(_pab_fwd, _pab_bwd)
