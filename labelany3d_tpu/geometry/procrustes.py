"""Closed-form rigid / similarity registration (Kabsch, Umeyama).

The reference aligns generated assets to the scene with PnP + a median-ratio
scale (`src/util.py:464-493`); a batched weighted Procrustes/sim(3) solver is
the TPU-native building block for the same registration problem when 3D-3D
correspondences are available, and is used by the registration subsystem's
tests as the oracle-free ground truth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


class SimilarityTransform(NamedTuple):
    rotation: jnp.ndarray     # (..., 3, 3)
    translation: jnp.ndarray  # (..., 3)
    scale: jnp.ndarray        # (...)


def _weighted_centroid(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(pts * w[..., None], axis=-2) / wsum


@f32_precision
def kabsch(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment: R, t minimizing ||w (R src + t - dst)||^2.

    src/dst: (..., N, 3); weights: (..., N) or None. Batched SVD.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[-2]
    w = jnp.ones(src.shape[:-1], jnp.float32) if weights is None else jnp.asarray(weights, jnp.float32)

    mu_s = _weighted_centroid(src, w)
    mu_d = _weighted_centroid(dst, w)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", cd * w[..., None], cs)
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones(det.shape + (2,), jnp.float32), det[..., None]], axis=-1
    )
    r = jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)
    t = mu_d - jnp.einsum("...ij,...j->...i", r, mu_s)
    return r, t


@f32_precision
def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None
) -> SimilarityTransform:
    """Weighted similarity (sim(3)) alignment: s, R, t minimizing
    ||w (s R src + t - dst)||^2 (Umeyama 1991). Batched."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    w = jnp.ones(src.shape[:-1], jnp.float32) if weights is None else jnp.asarray(weights, jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)

    mu_s = _weighted_centroid(src, w)
    mu_d = _weighted_centroid(dst, w)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", cd * w[..., None], cs) / wsum[..., None, None]
    var_s = jnp.sum(w * jnp.sum(cs * cs, axis=-1), axis=-1) / wsum

    u, s_vals, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones(det.shape + (2,), jnp.float32), det[..., None]], axis=-1
    )
    r = jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)
    scale = jnp.sum(s_vals * d, axis=-1) / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale[..., None] * jnp.einsum("...ij,...j->...i", r, mu_s)
    return SimilarityTransform(rotation=r, translation=t, scale=scale)
