"""Depth alignment (hypothesis-batch RANSAC) vs sklearn-style oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry import (
    DEPTH_SENTINEL,
    align_depth_affine,
    fit_linear_1d,
    median_ratio_scale,
    ransac_linear_1d,
)


def test_fit_linear_closed_form(rng):
    x = rng.uniform(0, 10, 200).astype(np.float32)
    y = 2.5 * x + 1.0
    a, b = fit_linear_1d(jnp.asarray(x), jnp.asarray(y), jnp.ones(200))
    assert float(a) == pytest.approx(2.5, abs=1e-4)
    assert float(b) == pytest.approx(1.0, abs=1e-3)
    a0, b0 = fit_linear_1d(jnp.asarray(x), jnp.asarray(2.0 * x), jnp.ones(200), intercept=False)
    assert float(a0) == pytest.approx(2.0, abs=1e-5)
    assert float(b0) == 0.0


def test_ransac_rejects_outliers(rng):
    n = 4000
    x = rng.uniform(1, 10, n).astype(np.float32)
    y = 3.0 * x + 0.5
    out_idx = rng.choice(n, 800, replace=False)
    y[out_idx] += rng.uniform(20, 50, 800)  # gross outliers
    fit = ransac_linear_1d(
        jnp.asarray(x), jnp.asarray(y), jnp.ones(n, bool), jax.random.PRNGKey(0)
    )
    assert bool(fit.ok)
    assert float(fit.scale) == pytest.approx(3.0, abs=0.05)
    assert float(fit.shift) == pytest.approx(0.5, abs=0.3)
    # outliers excluded from the inlier set
    inl = np.asarray(fit.inliers)
    assert inl[out_idx].mean() < 0.05
    assert inl.mean() > 0.5


def test_ransac_no_intercept(rng):
    n = 2000
    x = rng.uniform(1, 5, n).astype(np.float32)
    y = 1.7 * x
    y[:200] = 100.0
    fit = ransac_linear_1d(
        jnp.asarray(x), jnp.asarray(y), jnp.ones(n, bool), jax.random.PRNGKey(1),
        intercept=False,
    )
    assert float(fit.scale) == pytest.approx(1.7, abs=0.02)
    assert float(fit.shift) == 0.0


def test_ransac_respects_valid_mask(rng):
    n = 1000
    x = rng.uniform(1, 5, n).astype(np.float32)
    y = 2.0 * x + 1.0
    valid = np.ones(n, bool)
    x[500:] = 1e6  # garbage but masked out
    valid[500:] = False
    fit = ransac_linear_1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), jax.random.PRNGKey(2))
    assert float(fit.scale) == pytest.approx(2.0, abs=0.05)


def test_align_depth_affine_matches_reference_shape(rng):
    h, w = 64, 96
    rel = rng.uniform(0.5, 4.0, (h, w)).astype(np.float32)
    met = 2.0 * rel  # pure scale (fit_intercept=False path)
    mask = np.zeros((h, w), bool)
    mask[8:56, 8:88] = True
    out = align_depth_affine(jnp.asarray(rel), jnp.asarray(met), jnp.asarray(mask), jax.random.PRNGKey(0))
    out = np.asarray(out)
    np.testing.assert_allclose(out[mask], met[mask], rtol=1e-3)
    assert (out[~mask] == DEPTH_SENTINEL).all()


def test_align_depth_affine_fallback_on_empty_mask(rng):
    rel = rng.uniform(1, 2, (16, 16)).astype(np.float32)
    met = rng.uniform(1, 2, (16, 16)).astype(np.float32)
    mask = np.zeros((16, 16), bool)
    out = np.asarray(align_depth_affine(jnp.asarray(rel), jnp.asarray(met), jnp.asarray(mask), jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out, met, atol=1e-6)  # reference falls back to metric


def test_align_depth_affine_batched_vmap(rng):
    rel = rng.uniform(0.5, 4.0, (3, 32, 32)).astype(np.float32)
    met = 1.5 * rel + 0.2
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    fn = jax.vmap(lambda r, m, k: align_depth_affine(r, m, None, k, intercept=True, max_valid_depth=None))
    out = np.asarray(fn(jnp.asarray(rel), jnp.asarray(met), keys))
    np.testing.assert_allclose(out, met, rtol=5e-3, atol=5e-3)


def test_median_ratio_scale():
    scene = jnp.full((8, 8), 6.0)
    render = jnp.full((8, 8), 2.0)
    overlap = jnp.ones((8, 8), bool)
    s, has = median_ratio_scale(scene, render, overlap)
    assert float(s) == pytest.approx(3.0)
    assert bool(has)
    s2, has2 = median_ratio_scale(scene, render, jnp.zeros((8, 8), bool))
    assert not bool(has2)
