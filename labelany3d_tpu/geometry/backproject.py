"""Depth-map back-projection to 3D point maps, batched.

Parity target: `src/util.py:52-75` (`depth_to_points`, ZoeDepth-derived) in
the reference repo, which loops a (3,3) matmul over every pixel via numpy
broadcasting on host. Here the same map is one einsum that XLA fuses with the
surrounding pipeline and tiles onto the MXU/VPU; the per-pixel ray directions
are computed once per camera and reused across depth maps.
"""

from __future__ import annotations

import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) homogeneous pixel coordinates [u, v, 1] (u = column index).

    Matches the reference convention (`src/util.py:64-69`): integer pixel
    corners, no half-pixel offset.
    """
    u = jnp.arange(width, dtype=dtype)
    v = jnp.arange(height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)


@f32_precision
def backproject_directions(K: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Per-pixel camera-ray directions K^-1 [u, v, 1]; (..., H, W, 3)."""
    Kinv = jnp.linalg.inv(jnp.asarray(K, jnp.float32))
    grid = pixel_grid(height, width)
    return jnp.einsum("...ij,hwj->...hwi", Kinv, grid)


@f32_precision
def depth_to_points(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray | None = None,
    t: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Back-project (..., H, W) depth to (..., H, W, 3) world points.

    points = R @ (depth * K^-1 [u, v, 1]) + t

    Parity: `src/util.py:52-75`. `K`, `R`, `t` broadcast over the leading
    batch dims of `depth`; `R`/`t` default to identity/zero.
    """
    depth = jnp.asarray(depth, jnp.float32)
    height, width = depth.shape[-2], depth.shape[-1]
    dirs = backproject_directions(K, height, width)
    pts = depth[..., None] * dirs
    if R is not None:
        pts = jnp.einsum("...ij,...hwj->...hwi", jnp.asarray(R, jnp.float32), pts)
    if t is not None:
        pts = pts + jnp.asarray(t, jnp.float32)[..., None, None, :]
    return pts


def gather_instance_points(
    points: jnp.ndarray,
    masks: jnp.ndarray,
    num_samples: int,
    key,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample fixed-size per-instance point sets from a scene point map.

    The reference extracts per-object point clouds by boolean indexing
    (variable length) and then subsamples 500 points
    (`src/util_3dbox.py:123-125`). On TPU we keep shapes static: for each
    instance mask we draw `num_samples` pixel indices with probability
    proportional to the mask (sampling with replacement via Gumbel top-k on
    masked logits), and return the gathered points plus a per-instance
    validity flag (False when a mask is empty).

    Args:
      points: (H, W, 3) scene point map.
      masks: (I, H, W) boolean instance masks (padded instance slots allowed).
      num_samples: static number of points per instance.
      key: PRNG key.

    Returns:
      pts: (I, num_samples, 3), valid: (I,) bool.
    """
    import jax

    n_inst = masks.shape[0]
    flat_pts = points.reshape(-1, 3)
    flat_masks = masks.reshape(n_inst, -1)
    valid = jnp.any(flat_masks, axis=-1)

    # Gumbel-top-k over masked logits == uniform sampling without replacement
    # among mask pixels; when num_samples exceeds the mask size the extra
    # draws fall on masked-out pixels of maximal gumbel noise, so we re-draw
    # those uniformly *with* replacement from the top slot instead.
    logits = jnp.where(flat_masks, 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(key, flat_masks.shape)
    scores = logits + gumbel
    top_scores, top_idx = jax.lax.top_k(scores, num_samples)  # (I, S)
    in_mask = jnp.isfinite(top_scores)
    # Replace overflow draws by the instance's best pixel (always valid when
    # the mask is non-empty).
    top_idx = jnp.where(in_mask, top_idx, top_idx[:, :1])
    pts = flat_pts[top_idx]  # (I, S, 3)
    return pts, valid
