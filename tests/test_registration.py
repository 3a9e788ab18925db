"""PnP / Procrustes / focal-shift recovery tests on synthetic geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry import (
    kabsch,
    normalized_view_plane_uv,
    recover_focal_shift,
    refine_pose_gauss_newton,
    reprojection_error,
    solve_pnp_dlt,
    solve_pnp_ransac,
    umeyama,
)
from tests.oracles import rotate_y_np, solve_focal_shift_np


def _synthetic_pnp(rng, n=80, noise=0.0):
    K = np.array([[560.44, 0, 256], [0, 560.44, 256], [0, 0, 1]], np.float32)
    R = rotate_y_np(0.4) @ np.array(
        [[1, 0, 0], [0, np.cos(0.2), -np.sin(0.2)], [0, np.sin(0.2), np.cos(0.2)]]
    )
    t = np.array([0.2, -0.1, 2.5])
    obj = rng.uniform(-0.5, 0.5, (n, 3))
    cam = obj @ R.T + t
    uv = (cam @ K.T)[:, :2] / (cam @ K.T)[:, 2:]
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
    return obj.astype(np.float32), uv.astype(np.float32), K, R, t


def test_pnp_dlt_exact(rng):
    obj, uv, K, R, t = _synthetic_pnp(rng)
    R_est, t_est = solve_pnp_dlt(jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-3)


def test_pnp_gauss_newton_refines(rng):
    obj, uv, K, R, t = _synthetic_pnp(rng, noise=0.0)
    # Perturb the pose, then refine back.
    R0 = rotate_y_np(0.05) @ R
    t0 = t + np.array([0.05, -0.02, 0.08])
    R_ref, t_ref = refine_pose_gauss_newton(
        jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
    )
    err = reprojection_error(jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(K), R_ref, t_ref)
    assert float(err) < 1e-2
    np.testing.assert_allclose(np.asarray(R_ref), R, atol=1e-3)


def test_pnp_ransac_with_outliers(rng):
    obj, uv, K, R, t = _synthetic_pnp(rng, n=200, noise=0.3)
    uv[:40] += rng.uniform(60, 120, (40, 2))  # gross outliers
    res = solve_pnp_ransac(
        jnp.asarray(obj), jnp.asarray(uv), jnp.asarray(K),
        jnp.ones(200, bool), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[:40].mean() < 0.2 and inl[40:].mean() > 0.9
    np.testing.assert_allclose(np.asarray(res.rotation), R, atol=5e-2)
    np.testing.assert_allclose(np.asarray(res.translation), t, atol=5e-2)


def test_pnp_ransac_vmapped_over_objects(rng):
    objs, uvs, valids = [], [], []
    K = None
    for _ in range(3):
        o, u, K, _, _ = _synthetic_pnp(rng, n=64)
        objs.append(o)
        uvs.append(u)
        valids.append(np.ones(64, bool))
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    fn = jax.vmap(lambda o, u, v, k: solve_pnp_ransac(o, u, jnp.asarray(K), v, k, num_trials=64))
    out = fn(jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(uvs)), jnp.asarray(np.stack(valids)), keys)
    assert bool(out.ok.all())
    assert np.asarray(out.error).max() < 1.0


def test_kabsch_exact(rng):
    R = rotate_y_np(1.1)
    t = np.array([1.0, -2.0, 0.5])
    src = rng.normal(size=(50, 3))
    dst = src @ R.T + t
    R_est, t_est = kabsch(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)


def test_umeyama_with_scale_and_weights(rng):
    R = rotate_y_np(-0.6)
    t = np.array([0.3, 0.7, -1.0])
    s = 2.4
    src = rng.normal(size=(80, 3))
    dst = s * src @ R.T + t
    dst[:10] += 100.0  # corrupted, weighted out
    w = np.ones(80)
    w[:10] = 0.0
    est = umeyama(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), jnp.asarray(w, jnp.float32))
    assert float(est.scale) == pytest.approx(s, abs=1e-3)
    np.testing.assert_allclose(np.asarray(est.rotation), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.translation), t, atol=1e-3)


def test_normalized_view_plane_uv_convention():
    uv = np.asarray(normalized_view_plane_uv(64, 48))
    assert uv.shape == (48, 64, 2)
    diag = np.hypot(64, 48)
    np.testing.assert_allclose(uv[0, 0], [-64 / diag * 63 / 64, -48 / diag * 47 / 48], atol=1e-6)


def test_recover_focal_shift_matches_scipy(rng):
    # Build a synthetic affine point map: true focal/shift known.
    h, w = 48, 64
    uv = np.asarray(normalized_view_plane_uv(w, h))
    true_focal, true_shift = 1.2, 0.35
    depth = rng.uniform(2.0, 5.0, (h, w))
    xy = uv * depth[..., None] / true_focal
    z = depth - true_shift
    points = np.concatenate([xy, z[..., None]], axis=-1).astype(np.float32)

    focal, shift = recover_focal_shift(jnp.asarray(points))
    assert float(shift) == pytest.approx(true_shift, abs=2e-3)
    assert float(focal) == pytest.approx(true_focal, abs=2e-3)

    # scipy oracle agreement on the same downsampled problem
    f_ref, s_ref = solve_focal_shift_np(uv, points)
    assert float(shift) == pytest.approx(s_ref, abs=5e-3)
    assert float(focal) == pytest.approx(f_ref, abs=5e-3)


def test_recover_focal_shift_batched_with_mask(rng):
    h, w = 32, 32
    uv = np.asarray(normalized_view_plane_uv(w, h))
    maps, shifts = [], []
    for true_shift in (0.1, 0.6):
        depth = rng.uniform(1.5, 4.0, (h, w))
        xy = uv * depth[..., None] / 0.9
        z = depth - true_shift
        maps.append(np.concatenate([xy, z[..., None]], axis=-1))
        shifts.append(true_shift)
    pts = jnp.asarray(np.stack(maps), jnp.float32)
    mask = jnp.ones((2, h, w), bool)
    focal, shift = recover_focal_shift(pts, mask)
    np.testing.assert_allclose(np.asarray(shift), shifts, atol=5e-3)
    np.testing.assert_allclose(np.asarray(focal), [0.9, 0.9], atol=5e-3)


def test_pnp_planar_points_still_reasonable(rng):
    """All object points on one plane (the hull of a crop's front face):
    DLT degrades on planar scenes; RANSAC + GN must still return a pose
    whose reprojection error is small (pose ambiguity may flip, but the
    projection itself must fit)."""
    K = np.array([[560.44, 0, 256], [0, 560.44, 256], [0, 0, 1]], np.float32)
    R = rotate_y_np(0.3)
    t = np.array([0.1, 0.0, 2.0])
    obj = rng.uniform(-0.5, 0.5, (100, 3))
    obj[:, 2] = 0.0  # planar
    cam = obj @ R.T + t
    uv = (cam @ K.T)[:, :2] / (cam @ K.T)[:, 2:]
    res = solve_pnp_ransac(
        jnp.asarray(obj, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.asarray(K), jnp.ones(100, bool), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    assert float(res.error) < 2.0  # projection fits even if pose is the mirror
