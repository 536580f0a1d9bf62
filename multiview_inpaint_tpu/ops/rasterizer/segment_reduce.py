"""Gradient-path gathers for the pallas rasterizer.

TPU scatter-add serializes per update row, so the autodiff VJPs of the
two attribute gathers in ``api.render``'s pallas branch (an N-row
permutation, then the P-row pair expansion) are replaced:

- ``permute_rows``: VJP = gather by the inverse permutation (the
  scatter-add of a bijection is itself a permutation).
- ``gather_pairs``: VJP = the "double sort" reduction (PERF.md #4,
  mirroring the CUDA rasterizer's per-gaussian gradient accumulation
  without atomics): the forward pair sort put pairs in tile order;
  a second int32 sort (key = gaussian id, payload = position iota)
  groups the pair gradients back into contiguous per-gaussian
  segments, which reduce via ONE blocked MXU cumsum + a boundary
  searchsorted instead of a 1.7M-row scatter.

Precision note: segment sums come from differences of a global prefix
sum. With the 128-row blocked cumsum, positions in the same or nearby
blocks share their accumulated block-offset error, so the difference
cancels it and the residual is the intra-block f32 dot error (~2^-20
relative of the local segment) — verified against the XLA scatter-add
path by the pallas-vs-xla gradient tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` avoiding the XLA-TPU gather pathology at
    1024-multiple output lengths (measured 10.55 vs 4.67 ns/row, exact
    at the boundary — and every power-of-two capacity multiple hits it):
    gather 128 extra rows and slice."""
    p = idx.shape[0]
    if p % 1024 == 0 and p >= 128:
        return table[jnp.concatenate([idx, idx[:128]])][:p]
    return table[idx]


def _blocked_cumsum_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum over axis 0 of an f32 [P, C] array: 128-row
    blocks x a triangular-ones MXU matmul plus a tiny block-offset
    cumsum (XLA's native cumsum is ~log(P) full passes)."""
    p, c = x.shape
    b = 128
    nb = -(-p // b)
    xf = jnp.pad(x, ((0, nb * b - p), (0, 0)))
    xf = xf.reshape(nb, b, c)
    rows = jnp.arange(b)
    tri = (rows[:, None] <= rows[None, :]).astype(jnp.float32)
    intra = jnp.einsum("nbc,bk->nkc", xf, tri,
                       precision=jax.lax.Precision.HIGHEST)
    totals = intra[:, -1, :]                       # [nb, C]
    offs = jnp.cumsum(totals, axis=0) - totals     # exclusive, tiny
    return (intra + offs[:, None, :]).reshape(nb * b, c)[:p]


@jax.custom_vjp
def permute_rows(table: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """``table[order]`` for a permutation ``order``; differentiable with
    a gather-based VJP."""
    return safe_gather(table, order)


def _perm_fwd(table, order):
    return safe_gather(table, order), order


def _perm_bwd(order, g):
    return safe_gather(g, jnp.argsort(order)), None


permute_rows.defvjp(_perm_fwd, _perm_bwd)


@jax.custom_vjp
def gather_pairs(table: jnp.ndarray, gid: jnp.ndarray,
                 seg_lo: jnp.ndarray) -> jnp.ndarray:
    """``table[gid]`` (table [M, C] incl. sentinel row M-1, gid [P] with
    sentinel id M-1 for padding); VJP = double-sort segment reduction.

    ``seg_lo`` [M+1] int32: position of row r's first pair in the
    id-sorted pair order, i.e. the clamped per-row expansion starts
    (the id-sort groups row r's pairs at [seg_lo[r], seg_lo[r+1]));
    seg_lo[M] = P. The caller (binning) knows these exactly — a
    searchsorted over P here would cost more than the reduction.
    """
    return safe_gather(table, gid)


def _gp_fwd(table, gid, seg_lo):
    return safe_gather(table, gid), (gid, seg_lo, table.shape[0])


def _gp_bwd(res, g):
    gid, seg_lo, m = res
    p = gid.shape[0]
    pos = jnp.arange(p, dtype=jnp.int32)
    gid_s, pos_s = jax.lax.sort((gid, pos), num_keys=1)
    # (Layout note: the cotangent arrives as a column-major transpose
    # view of the pallas backward's [NROWS, P] output, so this gather
    # reads strided — but A/B'd against a forced row-major
    # materialization it costs the same 5.8 ms at 884k pairs: these
    # big row gathers are random-access latency-bound, not layout-
    # bound, matching the equally-priced row-major forward gather.)
    gg = safe_gather(g, pos_s)                      # [P, C] grouped rows
    # Sentinel-id slots include aligned-layout tail slots no backward
    # kernel ever writes; zero them so garbage can't ride the prefix.
    # (They sort to the end — gid sentinel is the maximum — so even a
    # NaN there could only reach the discarded sentinel row, but zeroing
    # is cheap and removes the dependence on that ordering argument.)
    gg = jnp.where((gid_s < m - 1)[:, None], gg, 0.0)
    cum = jnp.concatenate(
        [jnp.zeros((1, g.shape[1]), g.dtype), _blocked_cumsum_f32(gg)])
    ends = cum[seg_lo]                              # [M+1, C] one gather
    return ends[1:] - ends[:-1], None, None


gather_pairs.defvjp(_gp_fwd, _gp_bwd)
