"""Grid sampling and multi-scale deformable attention sampling.

Replaces two reference CUDA extensions (SURVEY.md §2B):
  * `grid_sample` — Hunyuan3D NeuS renderer's double-backward grid_sample
    (`external/Hunyuan3D-1/.../ops/gridsample_cuda.cu`): torch
    F.grid_sample semantics (normalized coords, align_corners switch,
    zero-padding); differentiable by construction in JAX (jvp/vjp free).
  * `deformable_sample` — OneFormer's multi-scale deformable attention core
    (`external/OneFormer-Colab/.../ms_deform_attn_cuda.cu`): per-query
    bilinear reads at predicted sampling locations over multiple feature
    levels, combined with attention weights.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coords: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] -> pixel coordinates, torch grid_sample semantics."""
    if align_corners:
        return (coords + 1.0) * 0.5 * (size - 1)
    return ((coords + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample with zero padding, torch F.grid_sample semantics.

    image: (H, W, C); grid: (..., 2) with (x, y) in [-1, 1].
    Returns (..., C). Vmappable over batch.
    """
    h, w, c = image.shape
    x = _unnormalize(grid[..., 0], w, align_corners)
    y = _unnormalize(grid[..., 1], h, align_corners)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def deformable_sample(
    value_levels: list[jnp.ndarray],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention aggregation.

    Args:
      value_levels: list of L feature maps (H_l, W_l, C).
      sampling_locations: (Q, L, P, 2) in [0, 1] (x, y), P points per level.
      attention_weights: (Q, L, P), softmax-normalized over (L, P).

    Returns (Q, C). Matches ms_deform_attn's aggregation: bilinear reads at
    each sampling point, weighted sum. align_corners=False convention
    (loc * 2 - 1 into grid_sample), as in the reference CUDA kernel.
    """
    out = 0.0
    for lvl, value in enumerate(value_levels):
        loc = sampling_locations[:, lvl]  # (Q, P, 2)
        grid = loc * 2.0 - 1.0
        sampled = grid_sample(value, grid, align_corners=False)  # (Q, P, C)
        w = attention_weights[:, lvl][..., None]  # (Q, P, 1)
        out = out + jnp.sum(sampled * w, axis=-2)
    return out
