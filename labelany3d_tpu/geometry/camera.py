"""Camera math: look-at frames, orbit poses, intrinsics, projection.

Parity targets: `src/cam_utils.py:14-52` (look_at / orbit_camera) and
`src/util.py:227-229` (project_to_2d) in the reference repo. Batched over
leading dims, pure jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision

from labelany3d_tpu.geometry.transforms import normalize


@f32_precision
def look_at(campos: jnp.ndarray, target: jnp.ndarray, opengl: bool = True) -> jnp.ndarray:
    """Camera rotation whose columns are (right, up, forward).

    Parity: `src/cam_utils.py:14-31`. With ``opengl=True`` the camera forward
    axis is +z (points from target toward the camera); otherwise -z.
    Broadcasts over leading batch dims; returns (..., 3, 3).
    """
    campos = jnp.asarray(campos, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    if opengl:
        forward = normalize(campos - target)
        right = normalize(jnp.cross(jnp.broadcast_to(world_up, forward.shape), forward))
        up = normalize(jnp.cross(forward, right))
    else:
        forward = normalize(target - campos)
        right = normalize(jnp.cross(forward, jnp.broadcast_to(world_up, forward.shape)))
        up = normalize(jnp.cross(right, forward))
    return jnp.stack([right, up, forward], axis=-1)


@f32_precision
def orbit_camera(
    elevation: jnp.ndarray,
    azimuth: jnp.ndarray,
    radius=1.0,
    is_degree: bool = True,
    target=None,
    opengl: bool = True,
) -> jnp.ndarray:
    """Elevation/azimuth -> camera-to-world pose matrix (..., 4, 4).

    Parity: `src/cam_utils.py:35-52`. Elevation in (-90, 90), measured from
    +y toward -y; azimuth in (-180, 180), from +z toward +x.
    """
    elevation = jnp.asarray(elevation, jnp.float32)
    azimuth = jnp.asarray(azimuth, jnp.float32)
    radius = jnp.asarray(radius, jnp.float32)
    if is_degree:
        elevation = jnp.deg2rad(elevation)
        azimuth = jnp.deg2rad(azimuth)
    x = radius * jnp.cos(elevation) * jnp.sin(azimuth)
    y = -radius * jnp.sin(elevation)
    z = radius * jnp.cos(elevation) * jnp.cos(azimuth)
    offset = jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)
    if target is None:
        target = jnp.zeros(3, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    campos = offset + target

    rot = look_at(campos, jnp.broadcast_to(target, campos.shape), opengl)
    batch = rot.shape[:-2]
    pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch + (4, 4))
    pose = pose.at[..., :3, :3].set(rot)
    pose = pose.at[..., :3, 3].set(campos)
    return pose


def intrinsics_from_focal_center(fx, fy, cx, cy) -> jnp.ndarray:
    """Build (..., 3, 3) pinhole intrinsics from focal lengths and center."""
    fx, fy, cx, cy = jnp.broadcast_arrays(
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
    )
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zero, cx], axis=-1),
        jnp.stack([zero, fy, cy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


@f32_precision
def project_points(points: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Pinhole projection of (..., N, 3) camera-space points to (..., N, 2).

    Parity: `src/util.py:227-229` / `src/tools/combine_results.py:105-108`
    (the reference divides by z with no epsilon; we guard the sign-preserving
    epsilon so points at z=0 do not produce inf under jit).
    """
    points = jnp.asarray(points)
    uvw = jnp.einsum("...ij,...nj->...ni", K, points)
    z = uvw[..., 2:3]
    z = jnp.where(jnp.abs(z) > eps, z, jnp.where(z >= 0, eps, -eps))
    return uvw[..., :2] / z


def point_to_plane_distance(plane: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Unsigned distance from (..., N, 3) points to plane [a, b, c, d].

    Parity: `src/util_3dbox.py:58-64`.
    """
    plane = jnp.asarray(plane, jnp.float32)
    n = plane[..., :3]
    d = plane[..., 3:]
    num = jnp.abs(jnp.einsum("...j,...nj->...n", n, points) + d)
    den = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return num / jnp.maximum(den, 1e-12)


def scale_intrinsics(K: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Rescale intrinsics for a resized image (fx,cx *= sx; fy,cy *= sy)."""
    K = jnp.asarray(K, jnp.float32)
    sx = jnp.asarray(scale_x, jnp.float32)
    sy = jnp.asarray(scale_y, jnp.float32)
    out = K.at[..., 0, :].multiply(sx[..., None])
    out = out.at[..., 1, :].multiply(sy[..., None])
    return out


def normalized_to_pixel_intrinsics(K_norm: jnp.ndarray, width, height) -> jnp.ndarray:
    """Convert MoGe-style normalized intrinsics (principal point 0.5) to pixels.

    Parity: `external/MoGe/infer_moge.py:30` in the reference, which scales
    row 0 by image width and row 1 by image height.
    """
    return scale_intrinsics(K_norm, jnp.asarray(width, jnp.float32), jnp.asarray(height, jnp.float32))
