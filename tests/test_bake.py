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


def test_uv_unwrap_box_layout():
    from labelany3d_tpu.models.trellis.bake import uv_unwrap_box

    mesh = _sphere_mesh()
    out = uv_unwrap_box(mesh)
    # per-corner split vertices
    assert len(out.vertices) == 3 * len(mesh.faces)
    assert out.faces.shape == mesh.faces.shape
    assert out.uv.shape == (len(out.vertices), 2)
    assert (out.uv >= 0).all() and (out.uv <= 1).all()
    # geometry preserved: same triangle soup
    np.testing.assert_allclose(
        out.vertices[out.faces], mesh.vertices[mesh.faces], atol=1e-6
    )
    # charts live in distinct grid cells: faces with opposite dominant
    # normals never share a cell
    cells = (np.floor(out.uv[:, 0] * 3).astype(int),
             np.floor(out.uv[:, 1] * 2).astype(int))
    assert len(set(zip(*cells))) > 1


def test_bake_texture_hemisphere():
    from labelany3d_tpu.models.trellis.bake import bake_texture

    mesh = _sphere_mesh()
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
    out = bake_texture(mesh, gs, texture_size=128, num_views=8,
                       image_size=128, radius=1.2)
    assert out.texture.shape == (128, 128, 3) and out.texture.dtype == np.uint8
    assert out.uv is not None and len(out.uv) == len(out.vertices)
    # vertex colors sampled from the atlas separate the hemispheres
    px = out.vertices[:, 0]
    strong = np.abs(px) > 0.15
    c = out.colors
    red_side = c[(px > 0) & strong]
    blue_side = c[(px < 0) & strong]
    assert red_side[:, 0].mean() > red_side[:, 2].mean() + 0.15
    assert blue_side[:, 2].mean() > blue_side[:, 0].mean() + 0.15


def test_textured_glb_roundtrip(tmp_path):
    from labelany3d_tpu.data.meshio import load_glb, save_glb
    from labelany3d_tpu.models.trellis.bake import uv_unwrap_box

    mesh = uv_unwrap_box(_sphere_mesh())
    rng = np.random.default_rng(0)
    mesh.texture = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    mesh.colors = None
    path = str(tmp_path / "textured.glb")
    save_glb(path, mesh)
    back = load_glb(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.uv, mesh.uv, atol=1e-6)
    np.testing.assert_array_equal(back.texture, mesh.texture)  # PNG lossless
    # UV-unaware consumers get vertex colors sampled from the texture
    assert back.colors is not None and back.colors.shape == (len(mesh.vertices), 3)
