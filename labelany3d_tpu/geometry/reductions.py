"""Masked reductions over padded (static-shape) data.

The reference pipeline filters with boolean indexing (dynamic shapes); on TPU
we carry validity masks and reduce with neutral elements instead. All
functions reduce over the last axis unless noted and broadcast over leading
batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

# NOTE: must be a Python float, not jnp.float32(...): a module-level jnp
# scalar is a *committed device constant* and capturing it inside jitted
# programs costs ~24 ms per call on the TPU tunnel backend (measured) —
# literals fold into the program for free.
_BIG = 3.4e38


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    """Mean of `x` where `mask`; 0 when the mask is empty."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0)


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, x, _BIG), axis=axis, keepdims=keepdims)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, x, -_BIG), axis=axis, keepdims=keepdims)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of `x[mask]` along the last axis (numpy semantics: the average
    of the two middle order statistics for even counts). 0 for empty masks.

    Implemented as a full sort with invalid entries pushed to +inf, then a
    gather at the (count-1)//2 and count//2 order statistics — static shapes,
    O(N log N) on the VPU.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    filled = jnp.where(mask, x, _BIG)
    s = jnp.sort(filled, axis=-1)
    count = jnp.sum(mask, axis=-1)
    lo = jnp.clip((count - 1) // 2, 0, n - 1)
    hi = jnp.clip(count // 2, 0, n - 1)
    lo_v = jnp.take_along_axis(s, lo[..., None], axis=-1)[..., 0]
    hi_v = jnp.take_along_axis(s, hi[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo_v + hi_v)
    return jnp.where(count > 0, med, 0.0)


def masked_mad(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median absolute deviation of `x[mask]` (sklearn RANSAC's default
    residual threshold is MAD of the targets; see
    sklearn.linear_model.RANSACRegressor docs)."""
    med = masked_median(x, mask)
    return masked_median(jnp.abs(x - med[..., None]), mask)
