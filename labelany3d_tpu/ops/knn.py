"""K-nearest-neighbor distances (simple-knn equivalent).

Parity target: `external/dreamgaussian/simple-knn/simple_knn.cu` in the
reference tree — mean distance to the 3 nearest neighbors, used to
initialize Gaussian-splat scales. On TPU: tiled pairwise-distance matmuls
(||a-b||^2 = |a|^2 + |b|^2 - 2ab) + `lax.top_k` — MXU-shaped, static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_distances(points: jnp.ndarray, k: int = 3, tile: int = 2048) -> jnp.ndarray:
    """(N, 3) points -> (N, k) squared distances to the k nearest others."""
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)

    pad = (-n) % tile
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad), constant_values=jnp.inf)
    num_tiles = pts_p.shape[0] // tile

    def tile_body(i, _):
        q = jax.lax.dynamic_slice_in_dim(pts_p, i * tile, tile)
        qsq = jax.lax.dynamic_slice_in_dim(sq_p, i * tile, tile)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * jnp.einsum(
            "tc,nc->tn", q, pts, precision=jax.lax.Precision.HIGHEST
        )
        # Exclude self-distance: the i-th query is global row i*tile+t.
        rows = i * tile + jnp.arange(tile)
        cols = jnp.arange(n)
        self_mask = rows[:, None] == cols[None, :]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return i + 1, -neg_top

    _, out = jax.lax.scan(lambda c, _: tile_body(c, _), 0, None, length=num_tiles)
    out = out.reshape(num_tiles * tile, k)[:n]
    return jnp.maximum(out, 0.0)


def mean_knn_distance(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """(N,) mean distance to the k nearest neighbors (simple-knn's output)."""
    d2 = knn_distances(points, k)
    return jnp.mean(jnp.sqrt(d2), axis=-1)
