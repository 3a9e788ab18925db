"""Numpy oracle implementations mirroring the reference's host math.

These re-state (not copy) the algorithms of `/root/reference/src/` cited per
function, so the JAX implementations can be tested for functional parity
without importing the reference's CUDA/torch stack.
"""

from __future__ import annotations

import math

import numpy as np


def depth_to_points_np(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Oracle for src/util.py:52-75 (identity extrinsics)."""
    Kinv = np.linalg.inv(K)
    h, w = depth.shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
    rays = coords @ Kinv.T
    return depth[..., None] * rays


def rotate_y_np(yaw: float) -> np.ndarray:
    return np.array(
        [
            [math.cos(yaw), 0, math.sin(yaw)],
            [0, 1, 0],
            [-math.sin(yaw), 0, math.cos(yaw)],
        ]
    )


def rotation_matrix_from_vectors_np(vec1, vec2):
    """Oracle for src/util_3dbox.py:37-55 (well-conditioned inputs only)."""
    v1 = np.asarray(vec1, float)
    v2 = np.asarray(vec2, float)
    v1 = v1 / np.linalg.norm(v1)
    v2 = v2 / np.linalg.norm(v2)
    axis = np.cross(v1, v2)
    cos_theta = float(np.dot(v1, v2))
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + k + k @ k * (1 - cos_theta) / (np.linalg.norm(axis) ** 2)


def convert_box_vertices_np(cx, cy, cz, l, w, h, yaw):
    """Oracle for src/util_3dbox.py:71-103."""
    local = np.array(
        [
            [-l / 2, -w / 2, -h / 2],
            [l / 2, -w / 2, -h / 2],
            [l / 2, w / 2, -h / 2],
            [-l / 2, w / 2, -h / 2],
            [-l / 2, -w / 2, h / 2],
            [l / 2, -w / 2, h / 2],
            [l / 2, w / 2, h / 2],
            [-l / 2, w / 2, h / 2],
        ]
    )
    rot = rotate_y_np(yaw)
    return local @ rot.T + np.array([cx, cy, cz])


def estimate_bbox_np(pc: np.ndarray, up: np.ndarray | None, yaw_method="pca"):
    """Oracle for src/util_3dbox.py:106-178, *without* the float16 cast and
    with the self-consistent inverse map for center/R (see boxfit.py doc).
    Returns (vertices, center_cam, dims[dz,dy,dx], R_cam, yaw)."""
    if up is not None:
        if np.dot([0, -1, 0], up[:3]) <= 0:
            up = -up
        r_g = rotation_matrix_from_vectors_np([0, -1, 0], up[:3])
    else:
        r_g = np.eye(3)
    rotated = pc @ r_g

    if yaw_method == "pca":
        xz = rotated[:, [0, 2]]
        c = xz - xz.mean(0)
        cov = c.T @ c
        evals, evecs = np.linalg.eigh(cov)
        v = evecs[:, np.argmax(evals)]
        if (v[0] if abs(v[0]) >= abs(v[1]) else v[1]) < 0:
            v = -v
        yaw = math.atan2(v[1], v[0])
    else:
        # exact min-area yaw via brute force over a fine grid in the
        # extents frame (x' = c x + s z, z' = -s x + c z)
        best_area, yaw = np.inf, 0.0
        for ang in np.linspace(0, math.pi / 2, 4096, endpoint=False):
            c_, s_ = math.cos(ang), math.sin(ang)
            u = c_ * rotated[:, 0] + s_ * rotated[:, 2]
            w = -s_ * rotated[:, 0] + c_ * rotated[:, 2]
            area = (u.max() - u.min()) * (w.max() - w.min())
            if area < best_area:
                best_area, yaw = area, ang

    p2 = (rotate_y_np(yaw) @ rotated.T).T
    mins, maxs = p2.min(0), p2.max(0)
    dims_xyz = maxs - mins
    center = (mins + maxs) / 2
    verts = convert_box_vertices_np(*center, *dims_xyz, 0.0)
    verts = (rotate_y_np(-yaw) @ verts.T).T
    verts = (r_g @ verts.T).T
    center_cam = r_g @ (rotate_y_np(-yaw) @ center)
    r_cam = r_g @ rotate_y_np(-yaw)
    dims = np.array([dims_xyz[2], dims_xyz[1], dims_xyz[0]])
    return verts, center_cam, dims, r_cam, yaw


def orbit_camera_np(elevation, azimuth, radius=1.0, opengl=True):
    """Oracle for src/cam_utils.py:35-52."""
    elevation = math.radians(elevation)
    azimuth = math.radians(azimuth)
    x = radius * math.cos(elevation) * math.sin(azimuth)
    y = -radius * math.sin(elevation)
    z = radius * math.cos(elevation) * math.cos(azimuth)
    campos = np.array([x, y, z])
    target = np.zeros(3)

    def norm(v):
        return v / max(np.linalg.norm(v), 1e-20)

    if opengl:
        forward = norm(campos - target)
        up = np.array([0.0, 1.0, 0.0])
        right = norm(np.cross(up, forward))
        up = norm(np.cross(forward, right))
    else:
        forward = norm(target - campos)
        up = np.array([0.0, 1.0, 0.0])
        right = norm(np.cross(forward, up))
        up = norm(np.cross(right, forward))
    T = np.eye(4)
    T[:3, :3] = np.stack([right, up, forward], axis=1)
    T[:3, 3] = campos
    return T


def crop_object_np(image: np.ndarray, mask: np.ndarray, crop_size=512, ratio=0.7):
    """Oracle for src/util.py:140-160, with the pad-and-place arithmetic only
    (resampling compared separately since interpolation kernels differ)."""
    ys, xs = np.nonzero(mask)
    x, y = xs.min(), ys.min()
    w, h = xs.max() - x + 1, ys.max() - y + 1
    side_len = int(max(w, h) / ratio)
    padded_image = np.zeros((side_len, side_len, 3), dtype=np.float64)
    padded_mask = np.zeros((side_len, side_len), dtype=np.float64)
    center = side_len // 2
    padded_image[center - h // 2 : center - h // 2 + h, center - w // 2 : center - w // 2 + w] = image[
        y : y + h, x : x + w
    ]
    padded_mask[center - h // 2 : center - h // 2 + h, center - w // 2 : center - w // 2 + w] = mask[
        y : y + h, x : x + w
    ]
    offset_x = x + (w - side_len) / 2
    offset_y = y + (h - side_len) / 2
    scale = crop_size / side_len
    return padded_image, padded_mask, (offset_x, offset_y, scale), (x, y, w, h, side_len)


def restore_mask_np(resized_mask, offset_x, offset_y, scale, out_shape):
    """Oracle for src/util.py:171-214 (cv2 INTER_NEAREST: src=floor(dst*r))."""
    crop_size = resized_mask.shape[0]
    ocs = int(crop_size / scale)
    ratio = crop_size / ocs
    unpadded = np.zeros((ocs, ocs), dtype=np.uint8)
    for r in range(ocs):
        for c in range(ocs):
            unpadded[r, c] = resized_mask[
                min(int(r * ratio), crop_size - 1), min(int(c * ratio), crop_size - 1)
            ]
    restored = np.zeros(out_shape, dtype=np.uint8)
    x1, y1 = int(round(offset_x)), int(round(offset_y))
    x2, y2 = x1 + ocs, y1 + ocs
    x1c, x2c = max(x1, 0), min(x2, out_shape[1])
    y1c, y2c = max(y1, 0), min(y2, out_shape[0])
    mx1, my1 = x1c - x1, y1c - y1
    restored[y1c:y2c, x1c:x2c] = unpadded[my1 : my1 + (y2c - y1c), mx1 : mx1 + (x2c - x1c)]
    return restored.astype(bool)


def analyze_mask_np(mask, scale_threshold=100, boundary_threshold=10):
    """Oracle for src/util.py:291-326."""
    m = mask.astype(np.int64)
    b = boundary_threshold
    total = m[:b].sum() + m[-b:].sum() + m[:, :b].sum() + m[:, -b:].sum()
    return total >= 10, m.sum() >= scale_threshold


def solve_focal_shift_np(uv, xyz):
    """Oracle for external/MoGe geometry_numpy.py:75-92 using scipy."""
    from scipy.optimize import least_squares

    uv = uv.reshape(-1, 2)
    xy = xyz[..., :2].reshape(-1, 2)
    z = xyz[..., 2].reshape(-1)

    def fn(shift):
        xy_proj = xy / (z + shift)[:, None]
        f = (xy_proj * uv).sum() / np.square(xy_proj).sum()
        return (f * xy_proj - uv).ravel()

    sol = least_squares(fn, x0=0, ftol=1e-3, method="lm")
    shift = float(np.squeeze(sol["x"]))
    xy_proj = xy / (z + shift)[:, None]
    focal = (xy_proj * uv).sum() / np.square(xy_proj).sum()
    return focal, shift
