"""Rotation and rigid-transform primitives, batched over leading dims.

Parity targets: `src/util_3dbox.py:20-55` (normalize, rotate_y,
rotation_matrix_from_vectors) in the reference repo. Unlike the reference,
every function here broadcasts over arbitrary leading batch dimensions and is
safe at the parallel/anti-parallel singularities of the Rodrigues formula.
"""

from __future__ import annotations

import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision

_EPS = 1e-12


def normalize(v: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Normalize vectors along the last axis; zero vectors pass through.

    Parity: `src/util_3dbox.py:20-25` (returns v unchanged when ||v|| == 0).
    """
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(norm > eps, v / jnp.maximum(norm, eps), v)


def rotate_y(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about the +y axis. `yaw` broadcasts; returns (..., 3, 3).

    Parity: `src/util_3dbox.py:28-34`.
    """
    yaw = jnp.asarray(yaw)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rows = [
        jnp.stack([c, zero, s], axis=-1),
        jnp.stack([zero, one, zero], axis=-1),
        jnp.stack([-s, zero, c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of (..., 3) vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


@f32_precision
def rotation_matrix_from_vectors(vec1: jnp.ndarray, vec2: jnp.ndarray) -> jnp.ndarray:
    """Rotation that maps unit(vec1) onto unit(vec2), via Rodrigues' formula.

    Parity: `src/util_3dbox.py:37-55`, which computes
    ``I + [axis]_x + [axis]_x^2 * (1 - cos) / ||axis||^2`` and divides by zero
    for (anti)parallel inputs. Here the singular cases are handled exactly:
    parallel -> identity; anti-parallel -> 180-degree rotation about a stable
    orthogonal axis.
    """
    a = normalize(jnp.asarray(vec1, jnp.float32))
    b = normalize(jnp.asarray(vec2, jnp.float32))
    axis = jnp.cross(a, b)
    cos_theta = jnp.sum(a * b, axis=-1)[..., None, None]
    s2 = jnp.sum(axis * axis, axis=-1)[..., None, None]  # = sin^2(theta)

    k = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), k.shape)
    # (1 - cos) / sin^2 = 1 / (1 + cos); stable except at cos = -1.
    general = eye + k + (k @ k) / jnp.maximum(1.0 + cos_theta, _EPS)

    # Anti-parallel: rotate pi about an axis orthogonal to `a`.
    # Pick the unit axis least aligned with `a` to build the orthogonal.
    helper = jnp.where(
        (jnp.abs(a[..., 0:1]) < 0.9),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], a.dtype), a.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], a.dtype), a.shape),
    )
    ortho = normalize(jnp.cross(a, helper))
    flip = 2.0 * ortho[..., :, None] * ortho[..., None, :] - jnp.eye(3, dtype=a.dtype)

    is_degenerate = s2 < 1e-10
    is_antiparallel = cos_theta < 0.0
    out = jnp.where(is_degenerate, jnp.where(is_antiparallel, flip, eye), general)
    return out


@f32_precision
def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) for (..., 3) rotation vectors."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, _EPS)
    k = skew(w / theta)
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    r = eye + jnp.sin(t) * k + (1.0 - jnp.cos(t)) * (k @ k)
    small = jnp.linalg.norm(w, axis=-1)[..., None, None] < 1e-8
    return jnp.where(small, eye + skew(w), r)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3); returns (..., 3) rotation vectors."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    axis_unnorm = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)[..., None]
    # General case: axis = unnorm / (2 sin(theta)); near theta=0 use 1st order.
    scale = jnp.where(
        jnp.abs(sin_theta) > 1e-6,
        theta[..., None] / jnp.maximum(2.0 * sin_theta, _EPS),
        0.5 + theta[..., None] ** 2 / 12.0,
    )
    return axis_unnorm * scale


def compose_transform(r: jnp.ndarray, t: jnp.ndarray, scale=None) -> jnp.ndarray:
    """Build (..., 4, 4) homogeneous transforms from rotation (+ opt. scale)."""
    r = jnp.asarray(r)
    t = jnp.asarray(t)
    if scale is not None:
        r = r * jnp.asarray(scale)[..., None, None]
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    out = jnp.broadcast_to(jnp.eye(4, dtype=r.dtype), batch + (4, 4))
    out = out.at[..., :3, :3].set(jnp.broadcast_to(r, batch + (3, 3)))
    out = out.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    return out
