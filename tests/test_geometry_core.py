"""Unit tests: transforms, camera, back-projection, reductions vs oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry import (
    depth_to_points,
    intrinsics_from_focal_center,
    look_at,
    masked_mad,
    masked_max,
    masked_median,
    masked_min,
    orbit_camera,
    point_to_plane_distance,
    project_points,
    rotate_y,
    rotation_matrix_from_vectors,
    so3_exp,
    so3_log,
)
from tests.oracles import depth_to_points_np, orbit_camera_np, rotate_y_np, rotation_matrix_from_vectors_np


def test_rotate_y_matches_oracle():
    for yaw in [0.0, 0.3, -1.2, np.pi]:
        np.testing.assert_allclose(np.asarray(rotate_y(yaw)), rotate_y_np(yaw), atol=1e-6)
    batched = rotate_y(jnp.array([0.1, 0.2]))
    assert batched.shape == (2, 3, 3)


def test_rotation_from_vectors_matches_oracle(rng):
    for _ in range(20):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        r_ours = np.asarray(rotation_matrix_from_vectors(a, b))
        r_ref = rotation_matrix_from_vectors_np(a, b)
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-5)
        # maps a-hat to b-hat
        np.testing.assert_allclose(r_ours @ (a / np.linalg.norm(a)), b / np.linalg.norm(b), atol=1e-5)


def test_rotation_from_vectors_degenerate():
    a = np.array([0.0, -1.0, 0.0])
    r_id = np.asarray(rotation_matrix_from_vectors(a, a))
    np.testing.assert_allclose(r_id, np.eye(3), atol=1e-6)
    r_flip = np.asarray(rotation_matrix_from_vectors(a, -a))
    np.testing.assert_allclose(r_flip @ a, -a, atol=1e-6)
    np.testing.assert_allclose(r_flip @ r_flip.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r_flip) == pytest.approx(1.0, abs=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(8, 3)) * 0.8
    r = so3_exp(jnp.asarray(w, jnp.float32))
    w2 = np.asarray(so3_log(r))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_orbit_camera_matches_oracle():
    for elev, azim in [(0, 0), (30, 45), (-20, 170), (45, -90)]:
        ours = np.asarray(orbit_camera(float(elev), float(azim), radius=2.0))
        ref = orbit_camera_np(elev, azim, radius=2.0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_look_at_opengl_conventions():
    campos = jnp.array([0.0, 0.0, 2.0])
    target = jnp.zeros(3)
    r = np.asarray(look_at(campos, target, opengl=True))
    # forward column should point from target toward camera (+z)
    np.testing.assert_allclose(r[:, 2], [0, 0, 1], atol=1e-6)


def test_depth_to_points_matches_oracle(rng):
    K = np.array([[500.0, 0, 32], [0, 480.0, 24], [0, 0, 1]])
    depth = rng.uniform(0.5, 10.0, size=(48, 64))
    ours = np.asarray(depth_to_points(depth, K))
    ref = depth_to_points_np(depth, K)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_depth_to_points_batched_with_pose(rng):
    K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    depth = rng.uniform(1, 5, size=(2, 24, 32)).astype(np.float32)
    R = rotate_y_np(0.4)
    t = np.array([0.1, -0.2, 0.3])
    ours = np.asarray(depth_to_points(depth, K, R, t))
    for b in range(2):
        base = depth_to_points_np(depth[b], K)
        ref = base @ R.T + t
        np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-4)


def test_project_points_roundtrip(rng):
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    pts = rng.uniform(-1, 1, size=(50, 3))
    pts[:, 2] = rng.uniform(2, 5, size=50)
    uv = np.asarray(project_points(pts, K))
    ref = (pts @ K.T)[:, :2] / (pts @ K.T)[:, 2:3]
    np.testing.assert_allclose(uv, ref, rtol=1e-5, atol=1e-4)


def test_intrinsics_from_focal_center():
    K = np.asarray(intrinsics_from_focal_center(100.0, 120.0, 32.0, 24.0))
    np.testing.assert_allclose(K, [[100, 0, 32], [0, 120, 24], [0, 0, 1]], atol=1e-6)


def test_point_to_plane_distance():
    plane = jnp.array([0.0, 1.0, 0.0, -2.0])  # y = 2
    pts = jnp.array([[0.0, 5.0, 0.0], [1.0, 2.0, 3.0]])
    d = np.asarray(point_to_plane_distance(plane, pts))
    np.testing.assert_allclose(d, [3.0, 0.0], atol=1e-6)


def test_masked_reductions(rng):
    x = rng.normal(size=37).astype(np.float32)
    mask = rng.uniform(size=37) > 0.4
    if not mask.any():
        mask[3] = True
    np.testing.assert_allclose(np.asarray(masked_median(x, mask)), np.median(x[mask]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked_min(x, mask)), x[mask].min(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked_max(x, mask)), x[mask].max(), atol=1e-6)
    mad = np.median(np.abs(x[mask] - np.median(x[mask])))
    np.testing.assert_allclose(np.asarray(masked_mad(x, mask)), mad, atol=1e-6)


def test_masked_median_even_count():
    x = jnp.array([1.0, 2.0, 3.0, 4.0, 100.0])
    mask = jnp.array([True, True, True, True, False])
    assert float(masked_median(x, mask)) == pytest.approx(2.5)


def test_geometry_jits():
    K = jnp.eye(3) * 100
    K = K.at[2, 2].set(1.0)
    depth = jnp.ones((8, 8))
    fn = jax.jit(depth_to_points)
    out = fn(depth, K)
    assert out.shape == (8, 8, 3)
