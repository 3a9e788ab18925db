"""Turntable trajectory video of a labeled scene (bpy_render equivalent).

Parity target: `src/bpy_render/bpy_load_blender_pointmap_plot.py:158-615`
in the reference repo — a Blender orbit animation of the scene mesh with 3D
box overlays, exported as H.264 mp4. Blender is not available in this
image; the same deliverable comes from the framework's own rasterizer
(`ops.rasterize`) plus cv2's video writer: scene mesh shaded by vertex
colors, box wireframes projected per frame, a small orbital sweep around
the scene like the reference's 4-keyframe camera path.
"""

from __future__ import annotations

import json

import numpy as np

from labelany3d_tpu.data.meshio import load_glb
from labelany3d_tpu.registration.renderer import OrbitRenderer

_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def render_trajectory_video(
    scene_dir,
    out_path: str,
    num_frames: int = 48,
    sweep_deg: float = 30.0,
    image_size: int = 320,
    fps: int = 12,
) -> str:
    """Render `<scene>/reconstruction/full_scene.glb` + boxes to an mp4.

    The camera orbits +-sweep/2 degrees of azimuth around the scene
    centroid at a distance framing the whole scene.
    """
    import cv2

    mesh = load_glb(scene_dir.root / "reconstruction" / "full_scene.glb")
    boxes = json.loads(scene_dir.bbox3d.read_text()) if scene_dir.bbox3d.exists() else []
    center = mesh.vertices.mean(axis=0)
    radius = float(np.linalg.norm(mesh.vertices - center, axis=-1).max()) * 2.5 + 1e-3

    K = np.array(
        [[image_size * 1.2, 0, image_size / 2],
         [0, image_size * 1.2, image_size / 2],
         [0, 0, 1]], np.float32,
    )
    renderer = OrbitRenderer(image_size=image_size, K=K)

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(str(out_path), fourcc, fps, (image_size, image_size))
    try:
        for f in range(num_frames):
            phase = f / max(num_frames - 1, 1)
            azim = -sweep_deg / 2 + sweep_deg * (0.5 - 0.5 * np.cos(2 * np.pi * phase))
            from labelany3d_tpu.registration.cameras import opencv_orbit_pose

            R, t = opencv_orbit_pose(10.0, float(azim), radius, target=center)
            view = renderer.render_pose(mesh, R, t)
            frame = (np.clip(view.rgba[..., :3], 0, 1) * 255).astype(np.uint8)
            frame = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            for box in boxes:
                verts = np.asarray(box["bbox3D_cam"], np.float64)
                cam = verts @ R.T + t
                ok = cam[:, 2] > 1e-3
                uvw = cam @ K.astype(np.float64).T
                uv = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)
                for a, b in _EDGES:
                    if ok[a] and ok[b]:
                        cv2.line(
                            frame,
                            tuple(np.round(uv[a]).astype(int)),
                            tuple(np.round(uv[b]).astype(int)),
                            (255, 80, 80), 1,
                        )
            writer.write(frame)
    finally:
        writer.release()
    return str(out_path)
