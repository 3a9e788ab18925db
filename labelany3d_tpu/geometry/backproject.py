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
    (variable length) and then subsamples 500 points *with replacement*
    (`np.random.randint`, `src/util_3dbox.py:123-125`). Same semantics,
    static shapes: per instance, draw `num_samples` uniform ranks among the
    mask's pixels and invert the mask's prefix-sum CDF (a binary-search
    gather) — O(HW) cumsum + O(S log HW) per instance, ~50x cheaper than a
    Gumbel top-k sort over the pixel grid.

    Args:
      points: (H, W, 3) scene point map.
      masks: (I, H, W) boolean instance masks (padded instance slots allowed).
      num_samples: static number of points per instance.
      key: PRNG key.

    Returns:
      pts: (I, num_samples, 3), valid: (I,) bool (False for empty masks).
    """
    import jax

    n_inst, h, w = masks.shape
    flat_pts = points.reshape(-1, 3)

    # Hierarchical inverse CDF over 4x4 pixel blocks: the block CDF is a
    # short cumsum (HW/16 entries) and the per-sample refinement only
    # gathers 16 mask bits — avoiding both the full-volume cumsum of a flat
    # CDF and the per-sample row gathers of a row/column scheme (each
    # measured ~10-20x slower on v5e).
    bs = 4
    gh, gw = h // bs, w // bs
    mb = (
        masks.reshape(n_inst, gh, bs, gw, bs)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_inst, gh * gw, bs * bs)
        .astype(jnp.int32)
    )
    blk_counts = jnp.sum(mb, axis=-1)                 # (I, NB)
    blk_cdf = jnp.cumsum(blk_counts, axis=-1)         # (I, NB)
    n_valid = blk_cdf[:, -1]
    valid = n_valid > 0

    draws = jax.random.randint(
        key, (n_inst, num_samples), 0, jnp.maximum(n_valid, 1)[:, None]
    )
    # Two-level broadcast-compare search instead of jnp.searchsorted: TPU
    # binary search costs a random gather per bisection round and the sort
    # method pays a full batched sort; comparing against 128 superblock
    # tails, then one contiguous 128-entry row per sample, is pure VPU work.
    nb = gh * gw
    sb = 128
    nsb = nb // sb
    cdf3 = blk_cdf.reshape(n_inst, nsb, sb)
    tails = cdf3[:, :, -1]                                        # (I, NSB)
    sb_idx = jnp.sum(tails[:, None, :] <= draws[:, :, None], axis=-1)
    sb_idx = jnp.clip(sb_idx, 0, nsb - 1)                          # (I, S)
    rows = jnp.take_along_axis(cdf3, sb_idx[:, :, None], axis=1)   # (I, S, sb)
    inner = jnp.sum(rows <= draws[:, :, None], axis=-1)
    blk = jnp.clip(sb_idx * sb + inner, 0, nb - 1)
    blk_excl = blk_cdf - blk_counts
    within = draws - jnp.take_along_axis(blk_excl, blk, axis=-1)  # (I, S)

    bits = jnp.take_along_axis(mb, blk[:, :, None], axis=1)       # (I, S, 16)
    inner_cdf = jnp.cumsum(bits, axis=-1)
    # position of the (within+1)-th set bit inside the block
    pos = jnp.argmax(inner_cdf > within[:, :, None], axis=-1)

    by = blk // gw
    bx = blk % gw
    py = pos // bs
    px = pos % bs
    idx = ((by * bs + py) * w + (bx * bs + px)).astype(jnp.int32)
    pts = flat_pts[idx]  # (I, S, 3)
    return pts, valid
