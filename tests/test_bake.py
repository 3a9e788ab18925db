"""Render-based vertex-color bake test: colors transfer from Gaussians."""

import numpy as np
import jax.numpy as jnp
import pytest

from labelany3d_tpu.data.meshio import Mesh
from labelany3d_tpu.models.trellis.bake import bake_vertex_colors
from labelany3d_tpu.models.trellis.decoders import GaussianSet


def _sphere_mesh(radius=0.3, n=12):
    us = np.linspace(0, 2 * np.pi, n, endpoint=False)
    vs = np.linspace(0.1, np.pi - 0.1, n)
    verts, faces = [], []
    for i, v in enumerate(vs):
        for j, u in enumerate(us):
            verts.append([radius * np.sin(v) * np.cos(u),
                          radius * np.cos(v),
                          radius * np.sin(v) * np.sin(u)])
    for i in range(n - 1):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    return Mesh(np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def test_bake_transfers_hemisphere_colors():
    mesh = _sphere_mesh()
    # Gaussians covering the sphere surface: red on +x side, blue on -x.
    pts = mesh.vertices.copy()
    n = len(pts)
    colors = np.where(pts[:, :1] > 0, [[1.0, 0.1, 0.1]], [[0.1, 0.1, 1.0]])
    gs = GaussianSet(
        means=jnp.asarray(pts),
        scales=jnp.full((n, 3), 0.05),
        rotations=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        opacities=jnp.full((n,), 0.95),
        colors=jnp.asarray(colors, jnp.float32),
        valid=jnp.ones((n,), bool),
    )
    out = bake_vertex_colors(mesh, gs, num_views=8, image_size=128, radius=1.2)
    assert out.shape == (n, 3)
    px = mesh.vertices[:, 0]
    strong = np.abs(px) > 0.15  # away from the color seam
    red_side = out[(px > 0) & strong]
    blue_side = out[(px < 0) & strong]
    assert red_side[:, 0].mean() > red_side[:, 2].mean() + 0.2
    assert blue_side[:, 2].mean() > blue_side[:, 0].mean() + 0.2


def test_bake_empty_gaussians_fallback():
    mesh = _sphere_mesh()
    gs = GaussianSet(
        means=jnp.zeros((4, 3)), scales=jnp.ones((4, 3)),
        rotations=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (4, 1)),
        opacities=jnp.zeros((4,)), colors=jnp.zeros((4, 3)),
        valid=jnp.zeros((4,), bool),
    )
    out = bake_vertex_colors(mesh, gs, num_views=2, image_size=64)
    np.testing.assert_allclose(out, 0.5)
