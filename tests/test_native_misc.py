"""Native RLE codec, prefetcher, and trajectory renderer tests."""

import time

import numpy as np
import pytest

import labelany3d_tpu.data.rle as R
from labelany3d_tpu.data.prefetch import Prefetcher
from labelany3d_tpu.native import load_rle


def test_native_rle_matches_python(rng):
    lib = load_rle()
    if lib is None:
        pytest.skip("no native toolchain")
    m = rng.uniform(size=(120, 90)) > 0.55
    counts_n = R.mask_to_rle(m)
    s_n = R.rle_to_string(counts_n)
    back_n = R.rle_to_mask(R.rle_from_string(s_n), 120, 90)
    orig = R._native
    try:
        R._native = lambda: None
        counts_p = R.mask_to_rle(m)
        s_p = R.rle_to_string(counts_p)
        back_p = R.rle_to_mask(R.rle_from_string(s_p), 120, 90)
    finally:
        R._native = orig
    np.testing.assert_array_equal(counts_n, counts_p)
    assert s_n == s_p
    np.testing.assert_array_equal(back_n, back_p)
    np.testing.assert_array_equal(back_n, m)


def test_prefetcher_order_and_concurrency():
    def work(i):
        time.sleep(0.01)
        return i * i

    out = list(Prefetcher(range(20), work, depth=4, num_workers=4))
    assert out == [i * i for i in range(20)]


def test_prefetcher_bounded_lookahead():
    """Workers never hold more than `depth` decoded-but-unconsumed results
    (the semaphore gate; without it a large split OOMs the host)."""
    import threading

    lock = threading.Lock()
    state = {"produced": 0, "consumed": 0, "max_ahead": 0}

    def work(i):
        with lock:
            state["produced"] += 1
            ahead = state["produced"] - state["consumed"]
            state["max_ahead"] = max(state["max_ahead"], ahead)
        return i

    out = []
    for r in Prefetcher(range(50), work, depth=3, num_workers=4):
        time.sleep(0.002)  # slow consumer: workers would run far ahead
        with lock:
            state["consumed"] += 1
        out.append(r)
    assert out == list(range(50))
    assert state["max_ahead"] <= 3 + 1  # depth slots (+1 for in-flight pop)


def test_prefetcher_propagates_errors():
    def work(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(Prefetcher(range(5), work))


def test_trajectory_video(tmp_path):
    import json

    from labelany3d_tpu.data.meshio import Mesh, save_glb
    from labelany3d_tpu.pipeline.scene import SceneDir

    sd = SceneDir(tmp_path / "scene").ensure()
    # simple colored cube scene at z=4
    s = 0.5
    v = np.array(
        [[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
         [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]], np.float32
    ) + np.array([0, 0, 4.0], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6]], np.int32)
    mesh = Mesh(v, f, colors=np.tile(np.array([[0.8, 0.2, 0.2]], np.float32), (8, 1)))
    save_glb(sd.root / "reconstruction" / "full_scene.glb", mesh)
    sd.bbox3d.write_text(json.dumps([{"bbox3D_cam": v.tolist(), "category_name": "box"}]))

    from labelany3d_tpu.utils.trajectory import render_trajectory_video

    out = render_trajectory_video(sd, str(tmp_path / "traj.mp4"),
                                  frames_per_segment=2, image_size=96)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_bbox_json_to_mesh_thick_edges():
    """Thick-edge parity (convert_bbox_json_to_ply :58-91): 12 prisms per
    box, 8 verts / 12 tris each, reference palette colors, adaptive
    thickness from the median box size."""
    from labelany3d_tpu.utils.trajectory import (
        adaptive_thickness,
        bbox_json_to_mesh,
    )

    corners = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float64
    )
    boxes = [{"bbox3D_cam": corners.tolist()},
             {"bbox3D_cam": (corners * 0.5 + 3).tolist()}]
    mesh = bbox_json_to_mesh(boxes)
    assert len(mesh.vertices) == 2 * 12 * 8
    assert len(mesh.faces) == 2 * 12 * 12
    assert mesh.colors.shape == (len(mesh.vertices), 3)
    # distinct palette colors per box
    c0 = mesh.colors[: 12 * 8]
    c1 = mesh.colors[12 * 8 :]
    assert not np.allclose(c0[0], c1[0])
    # thickness = median(mean dims) * ratio; boxes have mean dims 2 and 1
    t = adaptive_thickness(boxes, ratio=0.04)
    assert abs(t - 1.5 * 0.04) < 1e-6
    # prism girth matches the thickness
    bar = mesh.vertices[:8]
    widths = bar.max(axis=0) - bar.min(axis=0)
    assert abs(sorted(widths)[0] - t) < 1e-4


def test_trajectory_raycast():
    from labelany3d_tpu.data.meshio import Mesh
    from labelany3d_tpu.utils.trajectory import _raycast

    # unit quad at z=2 facing the origin
    v = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    hit = _raycast(np.zeros(3), np.array([0.0, 0.0, 1.0]), Mesh(v, f))
    np.testing.assert_allclose(hit, [0, 0, 2], atol=1e-6)
    # miss -> None
    assert _raycast(np.zeros(3), np.array([0.0, 0.0, -1.0]), Mesh(v, f)) is None
