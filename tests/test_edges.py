"""Normals / edge detection / grid meshing tests (save_moge_data role)."""

import numpy as np
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry.edges import (
    depth_edge,
    edge_filtered_scene_mesh,
    image_mesh,
    normals_edge,
    points_to_normals,
)


def _plane_points(h=32, w=32, z=4.0):
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return np.stack([xs * 0.01, ys * 0.01, np.full_like(xs, z)], axis=-1)


def test_normals_of_plane_point_toward_camera():
    pts = _plane_points()
    normals, nmask = points_to_normals(jnp.asarray(pts))
    n = np.asarray(normals)
    assert np.asarray(nmask).mean() > 0.9
    # fronto-parallel plane: |nz| ~ 1 in the interior
    interior = np.abs(n[4:-4, 4:-4, 2])
    np.testing.assert_allclose(interior, 1.0, atol=1e-3)


def test_depth_edge_detects_step():
    d = np.full((32, 32), 4.0, np.float32)
    d[:, 16:] = 6.0
    e = np.asarray(depth_edge(jnp.asarray(d), rtol=0.03))
    assert e[:, 15:17].all()          # the step column
    assert not e[:, 4:12].any()       # flat regions clean
    assert not e[:, 20:28].any()


def test_normals_edge_detects_crease():
    # Two planes meeting at a crease: normals differ across the fold.
    h, w = 32, 32
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    z = np.where(xs < 16, 4.0 + 0.0 * xs, 4.0 + 0.2 * (xs - 16))
    pts = np.stack([xs * 0.05, ys * 0.05, z], axis=-1)
    normals, nmask = points_to_normals(jnp.asarray(pts))
    ne = np.asarray(normals_edge(normals, tol_deg=5.0, mask=nmask))
    assert ne[8:-8, 15:18].any()      # crease detected
    assert not ne[8:-8, 4:10].any()   # flat half clean


def test_image_mesh_counts():
    pts = _plane_points(8, 8)
    mask = np.ones((8, 8), bool)
    mask[0, 0] = False
    verts, faces, cols = image_mesh(pts, np.zeros((8, 8, 3)), mask)
    assert len(verts) == 63
    # quads: 7*7 total, minus the 1 touching the masked corner
    assert len(faces) == 2 * (49 - 1)
    assert faces.max() < len(verts)


def test_edge_filtered_scene_mesh_drops_step_but_keeps_planes():
    h, w = 32, 32
    d = np.full((h, w), 4.0, np.float32)
    d[:, 16:] = 6.0
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    pts = np.stack([xs * 0.01, ys * 0.01, d], axis=-1)
    img = np.full((h, w, 3), 128, np.uint8)
    verts, faces, cols = edge_filtered_scene_mesh(
        pts, img, d, np.ones((h, w), bool)
    )
    assert len(verts) > 0 and len(faces) > 0
    # Reference semantics: drop pixels that are depth edges AND normal
    # edges; the step is both, so no face spans the depth discontinuity.
    span = np.abs(verts[faces][:, :, 2].max(axis=1) - verts[faces][:, :, 2].min(axis=1))
    assert span.max() < 1.0  # no triangle bridges the 2.0 depth step
