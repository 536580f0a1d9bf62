"""bf16-split gather transport: exactness and VJP fidelity.

The rasterizer integration tests (pallas-vs-xla values and grads) cover
this end to end; these pin the transport's own contracts so failures
localize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiview_inpaint_tpu.ops.rasterizer import bf16_transport as bt
from multiview_inpaint_tpu.ops.rasterizer.pallas_composite import pack_attrs


def test_mask_split_reconstruction_exactness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate([
        rng.uniform(-2000, 2000, 4096),      # pixel-coordinate range
        rng.uniform(-1, 1, 4096) * 10.0 ** rng.integers(-6, 3, 4096),
        np.zeros(16),
    ]).astype(np.float32))
    for terms, tol in ((4, 0.0), (3, 2 ** -24), (2, 2 ** -16)):
        parts = bt._mask_split(x, terms)
        rec = sum(p.astype(jnp.float32) for p in parts)
        err = np.abs(np.asarray(rec) - np.asarray(x))
        rel = err / np.maximum(np.abs(np.asarray(x)), 1e-30)
        if terms == 4:
            # 4 x 8-bit chunks cover the 24-bit significand exactly up
            # to the final rounding of a sub-ulp tail.
            assert rel.max() <= 2 ** -24, rel.max()
        else:
            assert rel.max() <= tol * 1.01, (terms, rel.max())


def test_split_columns_roundtrip_term_major():
    rng = np.random.default_rng(1)
    n = 500
    cols = [jnp.asarray(rng.standard_normal(n).astype(np.float32) * s)
            for s in (1000, 1000, 0.1, 0.1, 0.1, 1, 1, 1, 1, 10, 0.01)]
    table = bt.split_columns(cols, bt.PACK_TERMS)
    assert table.shape == (n, sum(bt.PACK_TERMS))
    rec = bt.reconstruct_rows(table.T, bt.PACK_TERMS, bt.N_PACK_COLS)
    assert rec.shape == (bt.N_PACK_COLS, n)
    for i, c in enumerate(cols):
        np.testing.assert_allclose(
            np.asarray(rec[i]), np.asarray(c),
            rtol=2 ** -16 if bt.PACK_TERMS[i] == 2 else 2 ** -23)
    assert float(jnp.abs(rec[len(cols):]).max()) == 0.0


def _toy_problem(seed=2, n=64, p=512):
    rng = np.random.default_rng(seed)
    packed = pack_attrs(
        jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.01, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.01, 1, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(1, 10, n).astype(np.float32)))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    # rank-space ids grouped ascending per "tile", sentinel n at the end
    gid = np.sort(rng.integers(0, n, p - 37)).astype(np.int32)
    gid = jnp.asarray(np.concatenate([gid, np.full(37, n, np.int32)]))
    # rank_lo: starts of each rank's pairs in id-sorted order
    counts = np.bincount(np.asarray(gid), minlength=n + 1)[:n]
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    rank_lo = jnp.asarray(np.concatenate(
        [starts[:-1], [starts[-1]], [p]]).astype(np.int32))
    return packed, order, gid, rank_lo


def test_pair_attrs_bf16_matches_plain_gather():
    packed, order, gid, rank_lo = _toy_problem()
    got = bt.pair_attrs_bf16(packed, order, gid, rank_lo)
    table = jnp.concatenate([packed[order],
                             jnp.zeros((1, packed.shape[1]))])
    want = table[gid].T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2 ** -15, atol=1e-6)


def test_pair_attrs_bf16_vjp_matches_autodiff():
    packed, order, gid, rank_lo = _toy_problem(seed=3)
    rng = np.random.default_rng(4)
    ct = jnp.asarray(rng.standard_normal(
        (bt.N_PACK_COLS, gid.shape[0])).astype(np.float32))

    def via_bt(pk):
        return jnp.sum(bt.pair_attrs_bf16(pk, order, gid, rank_lo) * ct)

    def via_plain(pk):
        table = jnp.concatenate([pk[order],
                                 jnp.zeros((1, pk.shape[1]))])
        return jnp.sum(table[gid].T * ct)

    g1 = jax.grad(via_bt)(packed)
    g2 = jax.grad(via_plain)(packed)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
