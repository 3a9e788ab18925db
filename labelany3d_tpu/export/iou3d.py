"""Oriented 3D box IoU (parity scoring against reference labels).

BASELINE.json's accuracy target is mean 3D IoU vs the reference's boxes on
COCO3D eval. Boxes are 9-DoF oriented cuboids; exact oriented-IoU needs
polytope clipping (data-dependent). TPU-native scoring instead uses a
deterministic stratified sample grid over the union AABB with
point-in-oriented-box tests — fully batched, error O(1/N) with N samples,
below 1e-2 at the default 32^3 grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


def box_params_from_corners(corners: jnp.ndarray):
    """(..., 8, 3) corners (convert_box_vertices order) -> (center, axes,
    half_sizes). Axes derive from edges 0->1, 0->3, 0->4."""
    c = jnp.asarray(corners, jnp.float32)
    center = jnp.mean(c, axis=-2)
    e0 = c[..., 1, :] - c[..., 0, :]
    e1 = c[..., 3, :] - c[..., 0, :]
    e2 = c[..., 4, :] - c[..., 0, :]
    edges = jnp.stack([e0, e1, e2], axis=-2)  # (..., 3, 3)
    lengths = jnp.linalg.norm(edges, axis=-1, keepdims=True)
    axes = edges / jnp.maximum(lengths, 1e-12)
    half = lengths[..., 0] / 2.0
    return center, axes, half


def points_in_box(points: jnp.ndarray, center, axes, half) -> jnp.ndarray:
    """(..., N, 3) points inside the oriented box? -> (..., N) bool."""
    rel = points - center[..., None, :]
    local = jnp.einsum("...ij,...nj->...ni", axes, rel)  # project on axes
    return jnp.all(jnp.abs(local) <= half[..., None, :] + 1e-6, axis=-1)


@f32_precision
def box3d_iou(corners_a: jnp.ndarray, corners_b: jnp.ndarray, grid: int = 32) -> jnp.ndarray:
    """IoU of oriented box pairs given (..., 8, 3) corner sets.

    Stratified-grid volume estimate over the union AABB; batched over
    leading dims.
    """
    ca, aa, ha = box_params_from_corners(corners_a)
    cb, ab, hb = box_params_from_corners(corners_b)

    lo = jnp.minimum(
        jnp.min(jnp.asarray(corners_a, jnp.float32), axis=-2),
        jnp.min(jnp.asarray(corners_b, jnp.float32), axis=-2),
    )
    hi = jnp.maximum(
        jnp.max(jnp.asarray(corners_a, jnp.float32), axis=-2),
        jnp.max(jnp.asarray(corners_b, jnp.float32), axis=-2),
    )
    ts = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    gx, gy, gz = jnp.meshgrid(ts, ts, ts, indexing="ij")
    unit = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (G^3, 3)
    span = hi - lo
    pts = lo[..., None, :] + unit * span[..., None, :]

    in_a = points_in_box(pts, ca, aa, ha)
    in_b = points_in_box(pts, cb, ab, hb)
    inter = jnp.sum(in_a & in_b, axis=-1).astype(jnp.float32)
    union = jnp.sum(in_a | in_b, axis=-1).astype(jnp.float32)
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)


def mean_iou3d(corners_pred, corners_ref, grid: int = 32) -> jnp.ndarray:
    """Mean IoU over matched box pairs (the BASELINE parity metric)."""
    ious = jax.vmap(lambda a, b: box3d_iou(a, b, grid))(
        jnp.asarray(corners_pred, jnp.float32), jnp.asarray(corners_ref, jnp.float32)
    )
    return jnp.mean(ious)
