"""Marching cubes, Gaussian splatting, sparse conv, background SDF tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.ops.marching_cubes import marching_cubes, marching_cubes_mesh
from labelany3d_tpu.ops.sparse_conv import (
    build_index_grid,
    sparse_downsample,
    subm_sparse_conv3d,
)
from labelany3d_tpu.ops.splat import SplatOut, quat_to_rotmat, rasterize_gaussians


# ------------------------------------------------------------ marching cubes

def _sphere_field(n, radius, center=None):
    ts = np.arange(n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ts, ts, ts, indexing="ij")
    c = (n - 1) / 2 if center is None else center
    return np.sqrt((gx - c) ** 2 + (gy - c) ** 2 + (gz - c) ** 2) - radius


def test_marching_cubes_sphere_geometry():
    n, r = 24, 8.0
    field = _sphere_field(n, r)
    verts, faces = marching_cubes_mesh(field, iso=0.0)
    assert len(verts) > 100 and len(faces) > 100
    # All vertices lie on the sphere (within one cell of interpolation error).
    c = (n - 1) / 2
    d = np.linalg.norm(verts - c, axis=-1)
    np.testing.assert_allclose(d, r, atol=0.25)
    # Surface area approximates 4 pi r^2.
    tri = verts[faces]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    assert areas.sum() == pytest.approx(4 * np.pi * r * r, rel=0.05)


def test_marching_cubes_watertight():
    field = _sphere_field(16, 5.0)
    verts, faces = marching_cubes_mesh(field)
    # Every edge is shared by exactly two triangles (closed surface).
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_cubes_empty_field():
    field = np.ones((8, 8, 8), np.float32)  # no crossing
    verts, faces = marching_cubes_mesh(field)
    assert len(verts) == 0 and len(faces) == 0


def test_marching_cubes_device_shapes():
    field = jnp.asarray(_sphere_field(10, 3.0))
    tris, valid = jax.jit(marching_cubes)(field)
    assert tris.shape == (9 * 9 * 9, 12, 3, 3)
    assert bool(valid.any())


# ------------------------------------------------------------- splatting

def test_quat_to_rotmat_identity_and_90deg():
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))), np.eye(3), atol=1e-6)
    # 90 deg about z: (w, z) = (cos45, sin45)
    r = np.asarray(quat_to_rotmat(jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])))
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_splat_single_gaussian_center():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = rasterize_gaussians(
        means=jnp.array([[0.0, 0.0, 4.0]]),
        scales=jnp.array([[0.1, 0.1, 0.1]]),
        rotations=jnp.array([[1.0, 0, 0, 0]]),
        opacities=jnp.array([0.9]),
        colors=jnp.array([[1.0, 0.2, 0.1]]),
        R=jnp.eye(3), t=jnp.zeros(3), K=K, image_size=(64, 64),
        gaussians_per_tile=8,
    )
    rgb = np.asarray(out.rgb)
    alpha = np.asarray(out.alpha)
    assert alpha[32, 32] > 0.5
    assert alpha[0, 0] < 1e-3
    # color at the center matches (alpha-weighted)
    np.testing.assert_allclose(rgb[32, 32] / alpha[32, 32], [1.0, 0.2, 0.1], atol=0.02)
    assert np.asarray(out.depth)[32, 32] / alpha[32, 32] == pytest.approx(4.0, abs=0.05)


def test_splat_occlusion_order():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    # Near red gaussian in front of far blue one, same line of sight.
    out = rasterize_gaussians(
        means=jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]]),
        scales=jnp.array([[0.05, 0.05, 0.05], [0.5, 0.5, 0.5]]),
        rotations=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1)),
        opacities=jnp.array([0.95, 0.95]),
        colors=jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        R=jnp.eye(3), t=jnp.zeros(3), K=K, image_size=(64, 64),
        gaussians_per_tile=8,
    )
    rgb = np.asarray(out.rgb)
    a = np.asarray(out.alpha)
    center = rgb[32, 32] / a[32, 32]
    assert center[0] > 0.7  # red dominates in front
    # Away from the near gaussian, the far blue one shows.
    edge = rgb[32, 10] / max(a[32, 10], 1e-6)
    assert edge[2] > 0.7


def test_splat_anisotropic_rotation():
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    # Elongated gaussian along x, rotated 90 deg about z -> elongated along y.
    base = dict(
        means=jnp.array([[0.0, 0.0, 4.0]]),
        scales=jnp.array([[0.8, 0.05, 0.05]]),
        opacities=jnp.array([0.9]),
        colors=jnp.array([[1.0, 1.0, 1.0]]),
        R=jnp.eye(3), t=jnp.zeros(3), K=K, image_size=(128, 128),
        gaussians_per_tile=8,
    )
    out_x = rasterize_gaussians(rotations=jnp.array([[1.0, 0, 0, 0]]), **base)
    qz = jnp.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    out_y = rasterize_gaussians(rotations=qz, **base)
    ax = np.asarray(out_x.alpha)
    ay = np.asarray(out_y.alpha)
    # x-elongated: wider along row 64; y-elongated: taller along col 64.
    assert (ax[64] > 0.1).sum() > 2 * (ax[:, 64] > 0.1).sum()
    assert (ay[:, 64] > 0.1).sum() > 2 * (ay[64] > 0.1).sum()


# ------------------------------------------------------------- sparse conv

def test_build_index_grid():
    coords = jnp.array([[1, 2, 3], [4, 5, 6], [0, 0, 0]])
    valid = jnp.array([True, True, False])
    grid = np.asarray(build_index_grid(coords, valid, 8))
    assert grid[1, 2, 3] == 0 and grid[4, 5, 6] == 1
    assert grid[0, 0, 0] == -1  # invalid slot dropped
    assert (grid >= -1).all()


def test_subm_sparse_conv_matches_dense(rng):
    g = 8
    n = 30
    coords = rng.integers(0, g, (n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    cin, cout, k = 4, 6, 3
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, k, cin, cout)).astype(np.float32) * 0.1
    valid = np.ones(n, bool)

    out = np.asarray(
        subm_sparse_conv3d(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
                           jnp.asarray(w), grid_size=g)
    )
    # Dense oracle: scatter to grid, correlate, gather active sites.
    dense = np.zeros((g, g, g, cin), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    ref = np.zeros((n, cout), np.float32)
    for i, (x, y, z) in enumerate(coords):
        acc = np.zeros(cout, np.float32)
        for dx in range(k):
            for dy in range(k):
                for dz in range(k):
                    xx, yy, zz = x + dx - 1, y + dy - 1, z + dz - 1
                    if 0 <= xx < g and 0 <= yy < g and 0 <= zz < g:
                        # submanifold: only active neighbors contribute
                        if (dense[xx, yy, zz] != 0).any() or any(
                            (coords == [xx, yy, zz]).all(1)
                        ):
                            acc += dense[xx, yy, zz] @ w[dx, dy, dz]
        ref[i] = acc
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_sparse_downsample_mean():
    coords = jnp.array([[0, 0, 0], [1, 1, 1], [4, 4, 4], [0, 1, 0]])
    feats = jnp.array([[1.0], [3.0], [10.0], [2.0]])
    valid = jnp.ones(4, bool)
    pooled, coarse, out_valid = sparse_downsample(feats, coords, valid, factor=2)
    pooled = np.asarray(pooled)
    out_valid = np.asarray(out_valid)
    coarse = np.asarray(coarse)
    # cells: (0,0,0) holds rows 0,1,3 -> mean 2.0; (2,2,2) holds row 2.
    reps = {tuple(coarse[i]): pooled[i, 0] for i in range(4) if out_valid[i]}
    assert reps[(0, 0, 0)] == pytest.approx(2.0)
    assert reps[(2, 2, 2)] == pytest.approx(10.0)
    assert out_valid.sum() == 2


# ------------------------------------------------------------- background SDF

@pytest.mark.slow
def test_background_model_fits_sphere(rng):
    from labelany3d_tpu.models.background import BackgroundConfig, BackgroundModel

    # Surface samples of a sphere.
    d = rng.normal(size=(2000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = d * 2.0 + np.array([1.0, -0.5, 3.0])
    model = BackgroundModel(BackgroundConfig(fit_steps=300, width=64, depth=3))
    loss = model.fit(pts)
    assert loss < 0.01
    verts, faces = model.extract_mesh(resolution=32)
    assert len(verts) > 50
    r = np.linalg.norm(verts - np.array([1.0, -0.5, 3.0]), axis=-1)
    assert np.median(np.abs(r - 2.0)) < 0.3
