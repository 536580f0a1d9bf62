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
import numpy as np

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


def term_sum_matrix(terms: Sequence[int], out_rows: int) -> jnp.ndarray:
    """[L, out_rows] bf16 0/1 matrix M with M[lane, col] = 1 iff split
    lane ``lane`` is a term of column ``col`` (term-major lane order, as
    ``split_columns`` emits): x_f32 = x_bf16_lanes @ M, exactly (0/1
    products are the bf16 terms themselves; sums of <= max(terms)
    exactly-representable values accumulate in f32).

    Why a matmul instead of ``.T`` + sublane adds: XLA's layout
    assignment may FUSE the transpose into the producing P-row gather —
    at reference scale it flips the [P, L] gather output (and the whole
    table chain above it) to the transposed {0,1} layout, turning each
    row gather into L strided 2-byte writes (measured 136 ms for 8M
    rows at N=2M vs the ~13 ms the bf16 row-gather rate implies). A dot
    consumer pins canonical row-major operands deterministically; the
    MXU pass itself is noise (~8 GFLOP at 8M pairs)."""
    ncols = len(terms)
    lanes = []
    for k in range(max(terms)):
        for c, t in enumerate(terms):
            if k < t:
                lanes.append(c)
    m = np.zeros((len(lanes), out_rows), np.float32)
    for lane, c in enumerate(lanes):
        m[lane, c] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


def exact_term_dot(x_bf: jnp.ndarray, m_bf: jnp.ndarray) -> jnp.ndarray:
    """[P, L] bf16 @ [L, C] 0/1 bf16 -> [P, C] f32, exact (bf16 terms
    are exact f32 values; 0/1 products select them; partial sums of
    disjoint-magnitude split terms are exactly representable). The CPU
    backend's DotThunk lacks bf16 x bf16 = f32, so interpret/test runs
    convert the operands — identical values, the convert is exact."""
    if jax.default_backend() == "cpu":
        return jax.lax.dot_general(
            x_bf.astype(jnp.float32), m_bf.astype(jnp.float32),
            (((1,), (0,)), ((), ())))
    return jax.lax.dot_general(x_bf, m_bf, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@jax.custom_vjp
def pair_attrs_bf16(packed: jnp.ndarray, order: jnp.ndarray,
                    gid: jnp.ndarray, rank_lo: jnp.ndarray,
                    full_order: jnp.ndarray | None = None
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
    out, _ = _pab_fwd(packed, order, gid, rank_lo, full_order)
    return out


def _split_table(packed: jnp.ndarray) -> jnp.ndarray:
    cols = [packed[:, i] for i in range(len(PACK_TERMS))]
    return split_columns(cols, PACK_TERMS)


def _pab_fwd(packed, order, gid, rank_lo, full_order=None):
    split_bf = _split_table(packed)                 # [N, 30] bf16
    lanes = split_bf.shape[1]
    # 128-lane pad BEFORE the N-row permutation gather too — the same
    # narrow-lane layout flip hit it at reference scale (36.7 ms for a
    # 2M-row permutation vs ~11 ms at the locality floor once padded).
    # optimization_barrier: the algebraic simplifier otherwise rewrites
    # gather(pad(x)) -> pad(gather(x)), reintroducing the narrow {0,1}
    # gather (measured: the barrier-less pad was hoisted and the
    # permutation gather ran 26-37 ms again).
    split_pad = jax.lax.optimization_barrier(
        jnp.pad(split_bf, ((0, 0), (0, 128 - lanes))))
    sorted_bf = safe_gather(split_pad, order)       # [M, 128] rank order
    # Sentinel row for the pair gather. Why the tables are 128 lanes
    # wide: a [P, 30] gather output tile-pads 30 -> 128 lanes anyway
    # (T(8,128)); leaving the width NARROW lets XLA's layout assignment
    # flip the whole table/gather chain to the transposed {0,1} layout
    # at reference scale to dodge that padding — which turns every
    # gathered row into 30 strided 2-byte transactions (measured 105 ms
    # for 8M rows at N=2M; every counter-formulation tried — dot
    # consumers, optimization_barrier, reshape anchors,
    # with_layout_constraint, u32 packing — left the flip in place,
    # scripts/exp_gather_layout.py). An EXPLICIT 128-lane table makes
    # {1,0} the only unpadded layout: the same gather runs at the
    # measured large-table locality floor (PERF.md round-3 lesson 8).
    # The term-sum then rides a 0/1 [128, 16] dot (exact; zero rows for
    # the pad lanes) and ONE explicit transpose into the kernel-facing
    # [NROWS, P].
    table = jax.lax.optimization_barrier(
        jnp.pad(sorted_bf, ((0, 1), (0, 0))))
    pairs_bf = safe_gather(table, gid)              # [P, 128] bf16
    m = jnp.pad(term_sum_matrix(PACK_TERMS, N_PACK_COLS),
                ((0, 128 - lanes), (0, 0)))
    attrs_t = exact_term_dot(pairs_bf, m).T         # [NROWS, P] f32
    return attrs_t, (order, gid, rank_lo, packed.shape[0], full_order)


def _pab_bwd(res, d):
    """d [NROWS, P] f32 -> d_packed [N, 16] f32 (f32-fidelity segment
    reduction; bf16 transport only for the latency-bound regroup
    gather)."""
    order, gid, rank_lo, n, full_order = res
    m = order.shape[0]          # rank-space size (== n unless culled)
    nrows, p = d.shape
    # One explicit transpose copy out of the kernel's [NROWS, P]
    # orientation, THEN the term-major 3-term split as whole-array mask
    # ops on [P, NROWS] (a per-row python loop + stack lowered to 48
    # separate [1, P] column-major fusions — 25 ms/step on hardware).
    # Building the gather table in [P, 48] row-major directly (instead
    # of splitting [48, P] and transposing into the gather) keeps the
    # regroup gather's rows contiguous at reference scale — see
    # term_sum_matrix on the layout-flip pathology.
    d_t = d.T                                       # [P, 16] f32 copy
    t0, t1, t2 = _mask_split(d_t, COT_TERMS)        # each [P, 16] bf16
    # 128-lane pad for the same layout reason as the forward pair
    # gather (see _pab_fwd): narrow rows invite the transposed-layout
    # flip at reference scale.
    d_bf = jax.lax.optimization_barrier(jnp.concatenate(
        [t0, t1, t2,
         jnp.zeros((p, 128 - 3 * nrows), jnp.bfloat16)], axis=1))
    pos = jnp.arange(p, dtype=jnp.int32)
    gid_s, pos_s = jax.lax.sort((gid, pos), num_keys=1)
    gg_bf = safe_gather(d_bf, pos_s)                # [P, 128] grouped
    m2 = jnp.pad(term_sum_matrix((COT_TERMS,) * nrows, nrows),
                 ((0, 128 - 3 * nrows), (0, 0)))
    gg = exact_term_dot(gg_bf, m2)                  # [P, 16] f32, exact
    # Sentinel-id slots (padding) must not ride the prefix.
    gg = jnp.where((gid_s < m)[:, None], gg, 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((1, nrows), jnp.float32), _blocked_cumsum_f32(gg)])
    # 128-lane pad + barrier on the f32 prefix: the same layout-flip
    # defense as the bf16 tables above, but EXACT (pad lanes are zeros,
    # values untouched). At reference scale XLA lays the narrow
    # [P+1, 16] prefix out column-major ({0,1}), turning each boundary
    # row gather below into 16 strided 4-byte transactions — measured
    # as the top two ops of the 2M-gaussian train step (48 + 30
    # ms/step); padded rows gather at the big-table locality floor
    # instead, where row WIDTH is free (PERF.md round-3 lesson 8).
    # The rank->id permutation is folded into the boundary INDICES
    # (cheap int32 1-D gathers), so the per-gaussian grad is the
    # difference of the same two f32 prefix rows as before — bitwise
    # identical output, one fewer [·, 16] row gather.
    cum_pad = jax.lax.optimization_barrier(
        jnp.pad(cum, ((0, 0), (0, 128 - nrows))))
    # Each gaussian's boundary positions ride the rank->id sort as
    # int32 payloads (contiguous SLICES of rank_lo, not gathers): a
    # plain 1-D gather of 2M random int32 indices is latency-bound per
    # 4-byte element and measured 13-15 ms EACH at reference scale —
    # the sort payload is ~free on top of the argsort the permutation
    # needs anyway.
    lo_r = rank_lo[:m]
    hi_r = rank_lo[1:m + 1]
    if m == n:
        _, lo, hi = jax.lax.sort(
            (order.astype(jnp.int32), lo_r, hi_r), num_keys=1)
        d_packed = (safe_gather(cum_pad, hi)
                    - safe_gather(cum_pad, lo))[:, :nrows]
    elif full_order is not None:
        # Culled rank space with the UNtruncated argsort available
        # (``order == full_order[:m]``, binning.TileBins.order_full):
        # the same ONE payload sort as the m == n branch, over the full
        # permutation — ranks >= m carry zero boundaries and a miss
        # flag. This replaces a searchsorted over n ids, which XLA
        # lowers to a ~log2(m)-pass while loop of [n]-row gathers
        # (measured 252 ms/step at N=2M — 60x this sort's cost).
        # Culled-out ids need no mask: their sort payloads are lo == hi
        # == 0, so the boundary difference is exactly zero. (An explicit
        # where() + late slice measurably broke the gather+subtract
        # fusion here — XLA flipped the [n, 128] chain to {0,1} and
        # inserted two 15 ms layout copies; mirroring the m == n
        # branch's subtract-then-slice keeps it fused.)
        pad0 = jnp.zeros((n - m,), rank_lo.dtype)
        _, lo, hi = jax.lax.sort(
            (full_order.astype(jnp.int32),
             jnp.concatenate([lo_r, pad0]),
             jnp.concatenate([hi_r, pad0])), num_keys=1)
        d_packed = (safe_gather(cum_pad, hi)
                    - safe_gather(cum_pad, lo))[:, :nrows]
    else:
        # Culled rank space, prefix only (direct callers): sort the M
        # (target, lo, hi) triples and align them to the full id range
        # with a searchsorted. Slow at reference scale (the while-loop
        # lowering above) — render() always provides full_order.
        ids = jnp.arange(n, dtype=jnp.int32)
        tgt_s, lo_s, hi_s = jax.lax.sort(
            (order.astype(jnp.int32), lo_r, hi_r), num_keys=1)
        pos = jnp.minimum(jnp.searchsorted(tgt_s, ids), m - 1)
        hit = tgt_s[pos] == ids
        diff = (safe_gather(cum_pad, hi_s[pos])
                - safe_gather(cum_pad, lo_s[pos]))
        d_packed = jnp.where(hit[:, None], diff[:, :nrows], 0.0)
    return d_packed, None, None, None, None


pair_attrs_bf16.defvjp(_pab_fwd, _pab_bwd)
