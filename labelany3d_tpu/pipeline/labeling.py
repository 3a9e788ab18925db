"""Fused batched labeling programs (the pipeline's device-side core).

This is the TPU-native re-design of the reference's geometric hot path. The
reference runs, per image and per object, on host: depth alignment
(`src/batch_scripts/depth.py:52-92`), back-projection (`src/util.py:52-75`),
mask indexing + 500-point subsampling and box fitting
(`src/util_3dbox.py:106-178`). Here the whole chain is two jittable
functions over padded (batch, instances, ...) arrays:

  depth_fusion:     relative + metric depth maps -> aligned metric depth
                    (hypothesis-batch RANSAC per image, vmapped)
  label_instances:  depth + K + instance masks -> oriented 3D boxes
                    (back-project once, Gumbel-top-k instance sampling,
                    vmapped box fit)

Both compose under one `jax.jit` and shard over the batch axis with `pjit`
(see `labelany3d_tpu.parallel`), so depth maps and masks never round-trip
to host between stages.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.geometry.align import align_depth_affine
from labelany3d_tpu.geometry.backproject import depth_to_points, gather_instance_points
from labelany3d_tpu.geometry.boxfit import BoxEstimate, fit_boxes_batch


class LabelingOutput(NamedTuple):
    boxes: BoxEstimate       # fields batched (B, I, ...)
    points: jnp.ndarray      # (B, H, W, 3) scene point map
    num_valid: jnp.ndarray   # (B,) instances with any mask pixels


def depth_fusion(
    relative_depth: jnp.ndarray,
    metric_depth: jnp.ndarray,
    mask: jnp.ndarray | None,
    key,
    *,
    intercept: bool = False,
    max_valid_depth: float | None = 400.0,
) -> jnp.ndarray:
    """Batched RANSAC depth alignment; (B, H, W) -> (B, H, W).

    Parity: stage 1's `align_depth` (`src/batch_scripts/depth.py:52-92`),
    vmapped over the image batch with per-image PRNG keys.
    """
    b = relative_depth.shape[0]
    keys = jax.random.split(key, b)
    if mask is None:
        fn = jax.vmap(
            lambda r, m, k: align_depth_affine(
                r, m, None, k, intercept=intercept, max_valid_depth=max_valid_depth
            )
        )
        return fn(relative_depth, metric_depth, keys)
    fn = jax.vmap(
        lambda r, m, msk, k: align_depth_affine(
            r, m, msk, k, intercept=intercept, max_valid_depth=max_valid_depth
        )
    )
    return fn(relative_depth, metric_depth, mask, keys)


def unpack_instance_masks(packed: jnp.ndarray, num_instances: int) -> jnp.ndarray:
    """(..., H, W) bitfield -> (..., I, H, W) bool; inverse of
    `stages.common.pack_instance_masks`, run on device inside the jitted
    step so the host ships I-fold fewer mask bytes."""
    bits = jnp.arange(num_instances, dtype=packed.dtype)
    expanded = packed[..., None, :, :] >> bits[:, None, None]
    return (expanded & 1).astype(bool)


def label_instances(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    masks: jnp.ndarray,
    key,
    up_vectors: jnp.ndarray | None = None,
    *,
    num_points: int = 500,
    method: str = "pca",
    max_depth_valid: float = 9000.0,
) -> LabelingOutput:
    """Depth-only 3D box labeling for a batch of images.

    Args:
      depth: (B, H, W) metric depth (10000.0 sentinel = invalid, matching
        the aligned-depth convention).
      K: (B, 3, 3) or (3, 3) pixel intrinsics.
      masks: (B, I, H, W) boolean instance masks, padded over I.
      key: PRNG key (instance subsampling).
      up_vectors: optional (B, I, 3) canonical upright directions; None uses
        the camera frame (identity), the depth-only path's default.
      num_points: per-instance point budget (reference subsamples 500,
        `src/util_3dbox.py:123-125`).
      method: 'pca' | 'minarea' yaw estimator.
      max_depth_valid: pixels at/above this depth are excluded (filters the
        10000.0 alignment sentinel).

    Returns LabelingOutput with every field batched (B, I, ...).
    """
    depth = jnp.asarray(depth, jnp.float32)
    b = depth.shape[0]
    points = depth_to_points(depth, K)  # (B, H, W, 3)
    depth_ok = (depth > 0) & (depth < max_depth_valid) & jnp.isfinite(depth)
    eff_masks = masks & depth_ok[:, None, :, :]

    keys = jax.random.split(key, b)
    pts, valid_inst = jax.vmap(
        lambda p, m, k: gather_instance_points(p, m, num_points, k)
    )(points, eff_masks, keys)  # (B, I, S, 3), (B, I)

    point_valid = jnp.ones(pts.shape[:-1], bool) & valid_inst[..., None]

    def fit_one_image(p, v, u):
        return fit_boxes_batch(p, v, u, method=method)

    if up_vectors is None:
        boxes = jax.vmap(lambda p, v: fit_boxes_batch(p, v, None, method=method))(
            pts, point_valid
        )
    else:
        boxes = jax.vmap(fit_one_image)(pts, point_valid, up_vectors)

    return LabelingOutput(
        boxes=boxes,
        points=points,
        num_valid=jnp.sum(valid_inst, axis=-1),
    )


def labeling_step(
    relative_depth: jnp.ndarray,
    metric_depth: jnp.ndarray,
    depth_mask: jnp.ndarray,
    K: jnp.ndarray,
    masks: jnp.ndarray,
    key,
    **label_kwargs,
) -> tuple[jnp.ndarray, LabelingOutput]:
    """Fused stage-1 + box-fit step: align depths, then label instances.

    One XLA program end-to-end; the returned aligned depth is what the
    scene-directory contract persists as `depth_map.npy`.
    """
    k1, k2 = jax.random.split(key)
    aligned = depth_fusion(relative_depth, metric_depth, depth_mask, k1)
    out = label_instances(aligned, K, masks, k2, **label_kwargs)
    return aligned, out


@lru_cache(maxsize=16)
def label_program(max_instances: int, num_points: int, method: str):
    """Shared jitted box-labeling program (bit-packed masks unpack on
    device). Module-level cache: a fresh stage instance per shard/resume
    must NOT build its own `jax.jit` wrapper — each wrapper re-traces and,
    over the tunnel backend, re-LOADS the program (minutes on a slow day;
    the r4 e2e bench's 'warm' pass warmed a different instance's wrapper
    and the timed shard paid the load again)."""

    def step(depth, K, packed, key):
        return label_instances(
            depth, K, unpack_instance_masks(packed, max_instances), key,
            num_points=num_points, method=method,
        )

    return jax.jit(step)


@lru_cache(maxsize=16)
def fused_label_program(max_instances: int, num_points: int, method: str):
    """Shared jitted fused fast-path program: depth fusion + box labeling
    in one XLA program, returning the aligned depth for persistence. See
    `label_program` for why this is cached at module level."""

    def step(rel, met, dmask, K, packed, key):
        k1, k2 = jax.random.split(key)
        aligned = depth_fusion(rel, met, dmask, k1)
        out = label_instances(
            aligned, K, unpack_instance_masks(packed, max_instances), k2,
            num_points=num_points, method=method,
        )
        return aligned, out.boxes

    return jax.jit(step)


depth_fusion_program = jax.jit(depth_fusion)
