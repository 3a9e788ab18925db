"""Oriented-box fitting vs numpy oracles (src/util_3dbox.py semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry import (
    convert_box_vertices,
    estimate_bbox,
    estimate_yaw_minarea,
    estimate_yaw_pca,
    fit_boxes_batch,
)
from tests.oracles import convert_box_vertices_np, estimate_bbox_np, rotate_y_np


def _random_box_cloud(rng, n=500, yaw=0.5, dims=(2.0, 1.0, 3.0), center=(0.5, -0.2, 4.0)):
    pts = (rng.uniform(-0.5, 0.5, size=(n, 3)) * np.array(dims)) @ rotate_y_np(yaw).T
    return pts + np.array(center)


def test_convert_box_vertices_matches_oracle():
    ours = np.asarray(convert_box_vertices(jnp.array([1.0, 2.0, 3.0]), jnp.array([2.0, 4.0, 6.0]), 0.3))
    ref = convert_box_vertices_np(1, 2, 3, 2, 4, 6, 0.3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pca_yaw_recovers_elongation(rng):
    # Strongly elongated cloud along a known direction in xz.
    true_yaw = -0.7
    pts = np.zeros((400, 3))
    pts[:, 0] = rng.uniform(-4, 4, 400)
    pts[:, 2] = rng.normal(0, 0.05, 400)
    pts = pts @ rotate_y_np(true_yaw).T
    yaw = float(estimate_yaw_pca(jnp.asarray(pts[:, [0, 2]]), jnp.ones(400, bool)))
    # rotate_y(true_yaw) maps x-axis elongation; PCA direction in (x, z):
    # principal axis of rotated cloud; yaw defined via atan2 of that axis.
    # Accept mod-pi equality.
    direction = np.array([np.cos(yaw), np.sin(yaw)])
    # elongation axis after R_y(t): x' = (cos t, -sin t) in (x, z)
    elong = np.array([np.cos(true_yaw), -np.sin(true_yaw)])
    cosang = abs(direction @ elong)
    assert cosang > 0.999


def test_minarea_yaw_matches_bruteforce(rng):
    pts = _random_box_cloud(rng, yaw=0.9)
    valid = np.ones(len(pts), bool)
    yaw = float(estimate_yaw_minarea(jnp.asarray(pts[:, [0, 2]]), jnp.asarray(valid)))
    # brute force oracle
    best_area, best = np.inf, 0.0
    for ang in np.linspace(0, np.pi / 2, 2048, endpoint=False):
        c, s = np.cos(ang), np.sin(ang)
        u = c * pts[:, 0] + s * pts[:, 2]
        w = -s * pts[:, 0] + c * pts[:, 2]
        area = (u.max() - u.min()) * (w.max() - w.min())
        if area < best_area:
            best_area, best = area, ang

    def area_at(a):
        c, s = np.cos(a), np.sin(a)
        u = c * pts[:, 0] + s * pts[:, 2]
        w = -s * pts[:, 0] + c * pts[:, 2]
        return (u.max() - u.min()) * (w.max() - w.min())

    assert area_at(yaw) <= best_area * 1.001


def test_estimate_bbox_no_ground_matches_oracle(rng):
    pts = _random_box_cloud(rng)
    est = estimate_bbox(jnp.asarray(pts, jnp.float32), method="pca", f16_vertices=False)
    verts, center, dims, r_cam, yaw = estimate_bbox_np(pts, None, "pca")
    np.testing.assert_allclose(np.asarray(est.dimensions), dims, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(est.center_cam), center, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(est.vertices), verts, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(est.R_cam), r_cam, atol=2e-3)


def test_estimate_bbox_with_ground_matches_oracle(rng):
    pts = _random_box_cloud(rng, yaw=0.2)
    up = np.array([0.15, -0.95, 0.1, 0.0])
    est = estimate_bbox(
        jnp.asarray(pts, jnp.float32), up_vector=jnp.asarray(up, jnp.float32),
        method="pca", f16_vertices=False,
    )
    verts, center, dims, r_cam, yaw = estimate_bbox_np(pts, up.copy(), "pca")
    np.testing.assert_allclose(np.asarray(est.dimensions), dims, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(est.center_cam), center, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(est.vertices), verts, rtol=5e-3, atol=5e-3)


def test_estimate_bbox_minarea_tightness(rng):
    pts = _random_box_cloud(rng, yaw=1.1)
    est = estimate_bbox(jnp.asarray(pts, jnp.float32), method="minarea", f16_vertices=False)
    _, _, dims_ref, _, _ = estimate_bbox_np(pts, None, "minarea")
    ours = float(jnp.prod(est.dimensions))
    ref = float(np.prod(dims_ref))
    assert ours <= ref * 1.005


def test_estimate_bbox_padding_invariance(rng):
    pts = _random_box_cloud(rng, n=300)
    padded = np.concatenate([pts, np.full((200, 3), 1e9)], axis=0)
    valid = np.concatenate([np.ones(300, bool), np.zeros(200, bool)])
    est_a = estimate_bbox(jnp.asarray(pts, jnp.float32), f16_vertices=False)
    est_b = estimate_bbox(jnp.asarray(padded, jnp.float32), jnp.asarray(valid), f16_vertices=False)
    np.testing.assert_allclose(np.asarray(est_a.dimensions), np.asarray(est_b.dimensions), atol=1e-4)
    np.testing.assert_allclose(np.asarray(est_a.center_cam), np.asarray(est_b.center_cam), atol=1e-4)


def test_estimate_bbox_nan_points_ignored(rng):
    pts = _random_box_cloud(rng, n=300)
    pts[10] = np.nan
    est = estimate_bbox(jnp.asarray(pts, jnp.float32), f16_vertices=False)
    assert bool(est.ok)
    assert np.isfinite(np.asarray(est.dimensions)).all()


def test_fit_boxes_batch_jits(rng):
    pts = np.stack([_random_box_cloud(rng, yaw=y) for y in (0.1, 0.6, -0.9, 0.0)])
    valid = np.ones(pts.shape[:2], bool)
    up = np.array([0.1, -0.98, 0.05])
    ups = np.tile(up, (4, 1))
    fn = jax.jit(lambda p, v, u: fit_boxes_batch(p, v, u, method="pca"))
    out = fn(jnp.asarray(pts, jnp.float32), jnp.asarray(valid), jnp.asarray(ups, jnp.float32))
    assert out.vertices.shape == (4, 8, 3)
    assert bool(out.ok.all())
    for i in range(4):
        _, _, dims_ref, _, _ = estimate_bbox_np(pts[i], np.append(up, 0.0), "pca")
        np.testing.assert_allclose(np.sort(np.asarray(out.dimensions[i])), np.sort(dims_ref), rtol=5e-3)


def test_estimate_bbox_empty_is_flagged():
    pts = jnp.zeros((16, 3))
    est = estimate_bbox(pts, jnp.zeros(16, bool))
    assert not bool(est.ok)


def test_fit_boxes_batch_minarea_pallas_interpret(rng, monkeypatch):
    """The Pallas-yaw batched path matches the jnp minarea path (interpret
    mode on CPU)."""
    import labelany3d_tpu.ops.boxfit_pallas as bp

    orig = bp.yaw_minarea_pallas
    monkeypatch.setattr(
        bp, "yaw_minarea_pallas",
        lambda p, v, num_angles=512, interpret=False: orig(p, v, num_angles=256, interpret=True),
    )
    pts = np.stack([_random_box_cloud(rng, yaw=y, n=128) for y in (0.3, 1.0, -0.5)])
    valid = np.ones(pts.shape[:2], bool)
    out_p = fit_boxes_batch(jnp.asarray(pts, jnp.float32), jnp.asarray(valid),
                            None, method="minarea_pallas", f16_vertices=False)
    out_j = fit_boxes_batch(jnp.asarray(pts, jnp.float32), jnp.asarray(valid),
                            None, method="minarea", f16_vertices=False)
    # Same footprint volume to within grid resolution.
    vol_p = np.prod(np.asarray(out_p.dimensions), axis=-1)
    vol_j = np.prod(np.asarray(out_j.dimensions), axis=-1)
    np.testing.assert_allclose(vol_p, vol_j, rtol=0.02)
    # With up vectors too
    ups = np.tile(np.array([0.05, -0.99, 0.02], np.float32), (3, 1))
    out_u = fit_boxes_batch(jnp.asarray(pts, jnp.float32), jnp.asarray(valid),
                            jnp.asarray(ups), method="minarea_pallas", f16_vertices=False)
    assert bool(np.asarray(out_u.ok).all())
