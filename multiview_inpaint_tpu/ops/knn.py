"""K-nearest-neighbor mean squared distance for gaussian scale init.

TPU-native replacement of the reference's CUDA ``simple-knn`` /
``distCUDA2(points)`` (``gs-simp/scene/gaussian_model.py:20,134``): the mean
squared distance from each point to its 3 nearest neighbors, used once at
init to size new gaussians.

Design: exact brute-force in chunks. The pairwise-distance block is a
matmul (``-2 x @ y^T`` plus norms) so it rides the MXU; ``lax.top_k`` of the
negated distances gives the 3-NN. O(N^2) FLOPs but only run at
initialization; 100k points = 40 GFLOP ~ tens of ms on one chip. Chunking
keeps the distance matrix at [chunk, N] so HBM stays bounded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3,
                     chunk: int = 4096) -> jnp.ndarray:
    """[N, 3] points -> [N] mean squared distance to the k nearest others."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    sq = jnp.sum(pts * pts, axis=-1)  # [N]
    n_chunks = -(-n // chunk)
    padded = jnp.pad(pts, ((0, n_chunks * chunk - n), (0, 0)))
    padded_sq = jnp.pad(sq, (0, n_chunks * chunk - n))
    valid_row = jnp.arange(n_chunks * chunk) < n

    def body(i, _):
        q = jax.lax.dynamic_slice_in_dim(padded, i * chunk, chunk)  # [C,3]
        qsq = jax.lax.dynamic_slice_in_dim(padded_sq, i * chunk, chunk)
        qvalid = jax.lax.dynamic_slice_in_dim(valid_row, i * chunk, chunk)
        d2 = (qsq[:, None] + sq[None, :]
              - 2.0 * jnp.dot(q, pts.T, preferred_element_type=jnp.float32))
        # Mask self-distance (exact index match) and out-of-range queries.
        row_ids = i * chunk + jnp.arange(chunk)
        self_mask = row_ids[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, jnp.maximum(d2, 0.0))
        neg_top, _ = jax.lax.top_k(-d2, k)  # [C, k]
        mean_d2 = jnp.mean(-neg_top, axis=-1)
        return i + 1, jnp.where(qvalid, mean_d2, 0.0)

    _, out = jax.lax.scan(lambda c, _: body(c, None), 0, None,
                          length=n_chunks)
    return out.reshape(-1)[:n]
