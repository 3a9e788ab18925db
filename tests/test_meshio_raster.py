"""Mesh IO (GLB/PLY) and rasterizer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from labelany3d_tpu.data.meshio import (
    Mesh,
    load_glb,
    load_ply_points,
    save_glb,
    save_ply_points,
)
from labelany3d_tpu.ops.rasterize import rasterize_mesh, shade_vertex_colors


def _cube_mesh(size=1.0):
    s = size / 2
    v = np.array(
        [[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
         [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]], np.float32
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [3, 2, 6], [3, 6, 7], [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]],
        np.int32,
    )
    return Mesh(vertices=v, faces=f)


def test_glb_roundtrip(tmp_path):
    mesh = _cube_mesh()
    mesh.colors = np.tile(np.array([[1.0, 0.5, 0.25]], np.float32), (8, 1))
    path = tmp_path / "cube.glb"
    save_glb(path, mesh)
    loaded = load_glb(path)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)
    np.testing.assert_allclose(loaded.colors, mesh.colors, atol=1e-6)


def test_glb_node_transform(tmp_path):
    # Write, then reload and check node transforms apply (we write identity;
    # apply_transform pre-bakes).
    mesh = _cube_mesh()
    mesh.apply_transform(np.diag([2.0, 2.0, 2.0, 1.0]))
    path = tmp_path / "scaled.glb"
    save_glb(path, mesh)
    loaded = load_glb(path)
    assert loaded.vertices.max() == pytest.approx(1.0)


def test_mesh_sample_on_surface():
    mesh = _cube_mesh(2.0)
    pts = mesh.sample(500, seed=1)
    assert pts.shape == (500, 3)
    # every sample lies on the cube surface: one coordinate at +-1
    on_face = np.isclose(np.abs(pts), 1.0, atol=1e-5).any(axis=1)
    assert on_face.all()
    assert mesh.area == pytest.approx(24.0)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, size=(100, 3)).astype(np.uint8)
    path = tmp_path / "cloud.ply"
    save_ply_points(path, pts, cols)
    p2, c2 = load_ply_points(path)
    np.testing.assert_allclose(p2, pts)
    np.testing.assert_array_equal(c2, cols)


def test_rasterize_single_triangle_depth():
    # Small fronto-parallel triangle at z=2 around the image center.
    verts = jnp.array([[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.2, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = rasterize_mesh(verts, faces, K, (64, 64), tile=16, faces_per_tile=8)
    d = np.asarray(out.depth)
    # center pixel inside the triangle at depth 2; corners outside
    assert d[32, 32] == pytest.approx(2.0, abs=1e-3)
    assert d[0, 0] == -1.0 and d[63, 63] == -1.0
    assert (np.asarray(out.face_id)[d > 0] == 0).all()
    # coverage approximates the projected area (base 40px x height 40px / 2)
    assert 150 <= (d > 0).sum() <= 260  # projected area = 20px * 20px / 2


def test_rasterize_occlusion():
    # Two fronto-parallel quads; nearer one wins in the overlap.
    verts = jnp.array(
        [[-1, -1, 4.0], [1, -1, 4.0], [1, 1, 4.0], [-1, 1, 4.0],
         [-0.3, -0.3, 2.0], [0.3, -0.3, 2.0], [0.3, 0.3, 2.0], [-0.3, 0.3, 2.0]],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]])
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = rasterize_mesh(verts, faces, K, (64, 64), tile=16, faces_per_tile=8)
    d = np.asarray(out.depth)
    assert d[32, 32] == pytest.approx(2.0, abs=1e-3)  # near quad occludes
    # far quad spans u in [7, 57]; near quad spans [17, 47]: pixel x=10 sees
    # only the far quad
    assert d[32, 10] == pytest.approx(4.0, abs=1e-3)

def test_rasterize_perspective_depth_interpolation():
    # Slanted triangle: depth varies; perspective-correct interpolation.
    verts = jnp.array([[-2.0, 0.0, 2.0], [2.0, 0.0, 6.0], [0.0, 2.0, 4.0]])
    faces = jnp.array([[0, 1, 2]])
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    out = rasterize_mesh(verts, faces, K, (128, 128), tile=16, faces_per_tile=8)
    d = np.asarray(out.depth)
    hit = d > 0
    assert hit.sum() > 50
    assert d[hit].min() >= 2.0 - 1e-3 and d[hit].max() <= 6.0 + 1e-3


def test_shade_vertex_colors():
    verts = jnp.array([[-1.0, -1.0, 2.0], [1.0, -1.0, 2.0], [0.0, 1.0, 2.0]])
    faces = jnp.array([[0, 1, 2]])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = rasterize_mesh(verts, faces, K, (64, 64), tile=16, faces_per_tile=8)
    rgba = np.asarray(shade_vertex_colors(out, faces, colors))
    hit = np.asarray(out.depth) > 0
    # colors sum to ~1 per pixel (barycentric partition of unity)
    sums = rgba[..., :3].sum(-1)
    np.testing.assert_allclose(sums[hit], 1.0, atol=1e-2)
    assert (rgba[~hit][..., 3] == 0).all()


def test_rasterize_behind_camera_culled():
    verts = jnp.array([[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.0, -2.0]])
    faces = jnp.array([[0, 1, 2]])
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = rasterize_mesh(verts, faces, K, (64, 64), tile=16, faces_per_tile=8)
    assert (np.asarray(out.depth) == -1.0).all()


def test_glb_strided_accessor(tmp_path):
    """GLB with interleaved (byteStride) vertex data must load correctly."""
    import json as _json
    import struct

    # Interleave position (12B) + padding (4B) per vertex: stride 16.
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    interleaved = b""
    for v in verts:
        interleaved += v.tobytes() + b"\x00\x00\x00\x00"
    indices = np.array([0, 1, 2], np.uint32).tobytes()
    bin_blob = interleaved + indices
    bin_blob += b"\x00" * ((-len(bin_blob)) % 4)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}]}],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(interleaved), "byteStride": 16},
            {"buffer": 0, "byteOffset": len(interleaved), "byteLength": len(indices)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": 3, "type": "SCALAR"},
        ],
    }
    js = _json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    path = tmp_path / "strided.glb"
    with open(path, "wb") as f:
        total = 12 + 8 + len(js) + 8 + len(bin_blob)
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_blob), 0x004E4942))
        f.write(bin_blob)
    mesh = load_glb(path)
    np.testing.assert_allclose(mesh.vertices, verts, atol=1e-6)
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


def test_ply_mesh_writer(tmp_path):
    from labelany3d_tpu.data.meshio import save_ply_mesh

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    c = np.array([[255, 0, 0]] * 3, np.uint8)
    path = tmp_path / "m.ply"
    save_ply_mesh(path, v, f, c)
    raw = path.read_bytes()
    assert b"element vertex 3" in raw and b"element face 1" in raw
    assert len(raw) > 100
