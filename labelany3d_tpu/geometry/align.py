"""Robust 1-D linear depth alignment (TPU-native RANSAC).

Parity targets in the reference repo:
  * `src/batch_scripts/depth.py:52-92`  — RANSAC(LinearRegression,
    fit_intercept=False), validity = ~isinf(relative) & metric < 400 & mask,
    output sentinel 10000.0 outside the mask, metric-depth fallback on
    failure.
  * `src/util.py:110-136`               — same with fit_intercept=True.
  * `src/util.py:464-493`               — median-ratio scale between a scene
    depth map and a rendered depth map on their mask overlap.

The reference runs sklearn's sequential RANSAC on host. The TPU-native
replacement is *hypothesis-batch* RANSAC: all trials are drawn, fitted
(closed form), and scored in one fixed-shape program — a (trials x points)
residual matrix on the VPU — then the best hypothesis' inliers are refit by
weighted least squares over the full valid set. sklearn's default residual
threshold (the MAD of the targets) and its inlier-refit semantics are kept.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.geometry.reductions import masked_mad, masked_median

DEPTH_SENTINEL = 10000.0  # reference: src/batch_scripts/depth.py:82


class LinearFit(NamedTuple):
    scale: jnp.ndarray      # a in y ~= a x + b
    shift: jnp.ndarray      # b
    inliers: jnp.ndarray    # bool mask over the input points
    ok: jnp.ndarray         # bool; False when the fit was degenerate


def fit_linear_1d(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, intercept: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted least-squares fit y ~= a x (+ b) along the last axis."""
    w = w.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
    sx = jnp.sum(w * x, axis=-1)
    sy = jnp.sum(w * y, axis=-1)
    sxx = jnp.sum(w * x * x, axis=-1)
    sxy = jnp.sum(w * x * y, axis=-1)
    if intercept:
        denom = n * sxx - sx * sx
        a = jnp.where(jnp.abs(denom) > 1e-12, (n * sxy - sx * sy) / denom, 0.0)
        b = (sy - a * sx) / n
    else:
        a = jnp.where(sxx > 1e-12, sxy / sxx, 0.0)
        b = jnp.zeros_like(a)
    return a, b


def _sample_valid_indices(key, valid: jnp.ndarray, count: int) -> jnp.ndarray:
    """Draw `count` indices uniformly (with replacement) among True entries of
    a flat bool mask via inverse-CDF on the mask prefix sum. When the mask is
    empty, returns zeros (callers must gate on n_valid)."""
    cdf = jnp.cumsum(valid.astype(jnp.int32))
    n_valid = cdf[-1]
    draws = jax.random.randint(key, (count,), 0, jnp.maximum(n_valid, 1))
    # searchsorted(cdf, d, 'right') finds the first index whose prefix count
    # exceeds d, i.e. the (d+1)-th valid element.
    return jnp.searchsorted(cdf, draws, side="right").astype(jnp.int32)


def ransac_linear_1d(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    key,
    *,
    intercept: bool = True,
    num_trials: int = 64,
    samples_per_trial: int = 64,
    residual_threshold: jnp.ndarray | None = None,
    max_points: int = 16384,
) -> LinearFit:
    """Hypothesis-batch RANSAC for y ~= a x (+ b) over flat masked arrays.

    All shapes static. `x`, `y`, `valid` are 1-D of equal length. The inlier
    threshold defaults to MAD(y[valid]) as in sklearn's RANSACRegressor.
    Scoring runs on a subsample of at most `max_points` valid points; the
    final refit uses every valid point classified as an inlier.
    """
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    valid = jnp.asarray(valid, bool).reshape(-1)
    n_valid = jnp.sum(valid)

    # Scoring subsample: uniform pixel draws with validity *weights* instead
    # of exact sampling-among-valid (a cumsum+searchsorted inverse CDF costs
    # ~10x more on TPU; with any reasonable valid fraction the effective
    # sample is still thousands of points and the estimator is unchanged).
    k_sub, k_trials = jax.random.split(key)
    sub_idx = jax.random.randint(k_sub, (max_points,), 0, x.shape[0])
    xs, ys = x[sub_idx], y[sub_idx]
    sub_ok = valid[sub_idx] & (n_valid > 0)

    if residual_threshold is None:
        thresh = masked_mad(ys, sub_ok)
    else:
        thresh = jnp.asarray(residual_threshold, jnp.float32)
    thresh = jnp.maximum(thresh, 1e-12)

    # --- hypothesis batch -------------------------------------------------
    trial_idx = jax.random.randint(
        k_trials, (num_trials, samples_per_trial), 0, max_points
    )
    tx = xs[trial_idx]  # (T, S)
    ty = ys[trial_idx]
    tw = sub_ok[trial_idx].astype(jnp.float32)
    a_t, b_t = fit_linear_1d(tx, ty, tw, intercept=intercept)  # (T,)

    resid = jnp.abs(ys[None, :] - (a_t[:, None] * xs[None, :] + b_t[:, None]))
    inlier_t = resid < thresh  # (T, P)
    score = jnp.sum(inlier_t & sub_ok[None, :], axis=-1)
    best = jnp.argmax(score)
    a0, b0 = a_t[best], b_t[best]

    # --- refit on the full-set inliers of the winning hypothesis ----------
    full_resid = jnp.abs(y - (a0 * x + b0))
    full_inliers = (full_resid < thresh) & valid
    enough = jnp.sum(full_inliers) >= 2
    a, b = fit_linear_1d(x, y, full_inliers.astype(jnp.float32), intercept=intercept)
    a = jnp.where(enough, a, a0)
    b = jnp.where(enough, b, b0)

    ok = n_valid >= 2
    a = jnp.where(ok, a, 1.0)
    b = jnp.where(ok, b, 0.0)
    return LinearFit(scale=a, shift=b, inliers=full_inliers, ok=ok)


def align_depth_affine(
    relative_depth: jnp.ndarray,
    metric_depth: jnp.ndarray,
    mask: jnp.ndarray | None,
    key,
    *,
    intercept: bool = False,
    max_valid_depth: float | None = 400.0,
    num_trials: int = 64,
    samples_per_trial: int = 64,
) -> jnp.ndarray:
    """Align a scale-invariant depth map to a metric one; returns (H, W).

    Parity: `src/batch_scripts/depth.py:52-92` with the defaults above
    (fit_intercept=False, max_valid_depth=400, sentinel 10000 outside the
    prediction mask, metric-depth fallback when no valid points). Set
    ``intercept=True, max_valid_depth=None`` for the `src/util.py:110-136`
    variant. Batch with `jax.vmap` over leading dims (split keys per image).
    """
    rel = jnp.asarray(relative_depth, jnp.float32)
    met = jnp.asarray(metric_depth, jnp.float32)
    finite_rel = jnp.isfinite(rel)
    fit_valid = finite_rel
    if max_valid_depth is not None:
        fit_valid = fit_valid & (met < max_valid_depth)
    if mask is not None:
        mask = jnp.asarray(mask, bool)
        fit_valid = fit_valid & mask
        predict_region = mask
    else:
        predict_region = finite_rel

    fit = ransac_linear_1d(
        rel.reshape(-1),
        met.reshape(-1),
        fit_valid.reshape(-1),
        key,
        intercept=intercept,
        num_trials=num_trials,
        samples_per_trial=samples_per_trial,
    )
    aligned = fit.scale * rel + fit.shift
    out = jnp.where(predict_region, aligned, DEPTH_SENTINEL)
    # Reference falls back to the metric map when the fit is impossible.
    return jnp.where(fit.ok, out, met)


def median_ratio_scale(
    scene_depth: jnp.ndarray,
    render_depth: jnp.ndarray,
    overlap: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Robust scale = median(scene/render) over an overlap mask.

    Parity: `src/util.py:478-486` (align_to_depth_match). Returns
    (scale, has_overlap); the reference returns identity when the overlap is
    empty, which callers reproduce by gating on `has_overlap`.
    """
    ratios = scene_depth / jnp.where(render_depth != 0, render_depth, 1.0)
    overlap = jnp.asarray(overlap, bool) & (render_depth != 0)
    scale = masked_median(ratios.reshape(-1), overlap.reshape(-1))
    return scale, jnp.any(overlap)
