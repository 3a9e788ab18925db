"""Oriented 3D bounding-box fitting with ground alignment, batched.

Parity target: `src/util_3dbox.py:71-224` in the reference repo
(`convert_box_vertices`, `estimate_bbox`, `_estimate_yaw_pca`,
`_estimate_yaw_convex_hull`).

TPU-first design notes
----------------------
* The reference subsamples 500 points, rotates them upright, picks a yaw by
  PCA or a convex-hull rotating-calipers sweep, then takes axis-aligned
  extents — per object, on host. Here everything is fixed-shape jnp over
  padded (instances, points) arrays: one `vmap`/`jit` fits every instance of
  an image batch at once.
* The rotating-calipers sweep (data-dependent hull size) is replaced by a
  dense *yaw grid search* evaluated as a single (N, 2) x (2, 2A) matmul plus
  masked min/max reductions — an MXU-shaped program whose minimum-area yaw is
  always <= the reference's hull-edge candidate set (grid + one refinement
  pass brings the discretization error below 1e-4 rad).
* The reference's `estimate_bbox` carries a frame inconsistency: vertices are
  mapped back to camera space with the *inverse* of the upright rotation
  (`np.dot(vertices, rotation_matrix.T)` == R_g @ v, `src/util_3dbox.py:169`)
  while `center_cam`/`R_cam` use `rotation_matrix.T @ ...` == R_g^T @ v
  (`:173-176`). We implement the self-consistent math (R_g everywhere, which
  matches the reference's exported `bbox3D_cam` vertices — the field that
  drives 2D projections and IoU); `compat_center_bug=True` reproduces the
  reference's `center_cam`/`R_cam` bit-behavior for parity testing.
* The reference casts vertices to float16 mid-computation
  (`src/util_3dbox.py:165`); `f16_vertices=True` (default) keeps that
  rounding so exported JSON matches.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision

from labelany3d_tpu.geometry.reductions import masked_max, masked_mean, masked_min
from labelany3d_tpu.geometry.transforms import rotate_y, rotation_matrix_from_vectors


class BoxEstimate(NamedTuple):
    vertices: jnp.ndarray    # (..., 8, 3) camera-space corners
    center_cam: jnp.ndarray  # (..., 3)
    dimensions: jnp.ndarray  # (..., 3) = [dz, dy, dx] (reference ordering)
    R_cam: jnp.ndarray       # (..., 3, 3) canonical -> camera rotation
    yaw: jnp.ndarray         # (...)
    ok: jnp.ndarray          # (...) bool; False when no valid points


# Corner ordering parity: src/util_3dbox.py:83-92. Kept as numpy (a
# module-level jnp array would be a committed device constant — expensive
# to capture in jitted programs on the tunnel backend; numpy folds free).
import numpy as _np

_LOCAL_CORNER_SIGNS = _np.array(
    [
        [-1, -1, -1],
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, 1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
    ],
    _np.float32,
)


@f32_precision
def convert_box_vertices(center: jnp.ndarray, dims_lwh: jnp.ndarray, yaw) -> jnp.ndarray:
    """8 corners of a yaw-oriented box; (..., 8, 3).

    Parity: `src/util_3dbox.py:71-103`. `dims_lwh` = (l, w, h) mapping to the
    x/y/z half-extents; corners are rotated by R_y(yaw) then translated.
    """
    center = jnp.asarray(center, jnp.float32)
    dims = jnp.asarray(dims_lwh, jnp.float32)
    local = _LOCAL_CORNER_SIGNS * (dims[..., None, :] / 2.0)
    rot = rotate_y(jnp.asarray(yaw, jnp.float32))
    rotated = jnp.einsum("...ij,...nj->...ni", rot, local)
    return rotated + center[..., None, :]


@f32_precision
def estimate_yaw_pca(points_xz: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Yaw of the first principal axis of (..., N, 2) ground-plane points.

    Parity: `src/util_3dbox.py:181-186` (sklearn PCA on the XZ columns). The
    2x2 eigenproblem is closed-form: theta = atan2(2 cov_xy, cov_xx - cov_zz)/2.
    Sign follows sklearn's `svd_flip` (largest-|.| component made positive),
    which only flips yaw by pi — box extents and volume are invariant.
    """
    mean = masked_mean(points_xz, valid[..., None], axis=-2, keepdims=True)
    centered = jnp.where(valid[..., None], points_xz - mean, 0.0)
    xx = jnp.sum(centered[..., 0] * centered[..., 0], axis=-1)
    zz = jnp.sum(centered[..., 1] * centered[..., 1], axis=-1)
    xz = jnp.sum(centered[..., 0] * centered[..., 1], axis=-1)
    theta = 0.5 * jnp.arctan2(2.0 * xz, xx - zz)
    v = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    # svd_flip: make the component with the largest magnitude positive.
    flip = jnp.where(jnp.abs(v[..., 0]) >= jnp.abs(v[..., 1]), v[..., 0], v[..., 1]) < 0
    v = jnp.where(flip[..., None], -v, v)
    return jnp.arctan2(v[..., 1], v[..., 0])


def _footprint_area(points_xz: jnp.ndarray, valid: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """AABB footprint area after rotating (..., N, 2) points by each angle.

    Rotation convention matches `rotate_y` acting on (x, z):
    u = cos*x + sin*z, w = -sin*x + cos*z, i.e. the frame the extents are
    later measured in (`src/util_3dbox.py:154-160`).
    One (N, 2) @ (2, 2A) matmul per instance -> MXU.
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    basis = jnp.stack([jnp.concatenate([c, -s]), jnp.concatenate([s, c])], axis=0)
    proj = points_xz @ basis  # (..., N, 2A): [:A] = u, [A:] = w
    a = angles.shape[0]
    vmask = valid[..., None]
    u_ext = masked_max(proj[..., :a], vmask, axis=-2) - masked_min(proj[..., :a], vmask, axis=-2)
    w_ext = masked_max(proj[..., a:], vmask, axis=-2) - masked_min(proj[..., a:], vmask, axis=-2)
    return u_ext * w_ext


@f32_precision
def estimate_yaw_minarea(
    points_xz: jnp.ndarray,
    valid: jnp.ndarray,
    num_angles: int = 128,
    refine: bool = True,
) -> jnp.ndarray:
    """Minimum-area-rectangle yaw via dense grid search (+ one refine pass).

    TPU-native replacement for the convex-hull rotating-calipers sweep
    (`src/util_3dbox.py:189-224`): instead of enumerating hull edges
    (data-dependent count), evaluate the AABB footprint on a static grid over
    [0, pi/2) (the min-area rectangle objective has period pi/2) and refine
    around the winner. The result's area is <= the hull-edge candidate set's.
    """
    period = math.pi / 2.0
    coarse = jnp.arange(num_angles, dtype=jnp.float32) * (period / num_angles)
    area = _footprint_area(points_xz, valid, coarse)
    best = jnp.argmin(area, axis=-1)
    yaw0 = jnp.take(coarse, best)
    if refine:
        step = period / num_angles
        fine_offsets = (jnp.arange(num_angles, dtype=jnp.float32) / num_angles - 0.5) * (2.0 * step)
        fine = yaw0[..., None] + fine_offsets
        # Evaluate per-batch fine grids: angles now depend on batch, so build
        # the rotation basis pointwise instead of via a shared matmul.
        c, s = jnp.cos(fine), jnp.sin(fine)  # (..., A)
        x = points_xz[..., 0]
        z = points_xz[..., 1]
        u = x[..., :, None] * c[..., None, :] + z[..., :, None] * s[..., None, :]
        w = -x[..., :, None] * s[..., None, :] + z[..., :, None] * c[..., None, :]
        vmask = valid[..., :, None]
        ue = masked_max(u, vmask, axis=-2) - masked_min(u, vmask, axis=-2)
        we = masked_max(w, vmask, axis=-2) - masked_min(w, vmask, axis=-2)
        fine_area = ue * we
        fbest = jnp.argmin(fine_area, axis=-1)
        yaw0 = jnp.take_along_axis(fine, fbest[..., None], axis=-1)[..., 0]
    return yaw0


@f32_precision
def upright_rotation(up_vector: jnp.ndarray | None, batch_shape=()) -> jnp.ndarray:
    """Rotation R_g with R_g @ [0,-1,0] = n (n sign-flipped toward -y).

    Parity: `src/util_3dbox.py:128-134`. Points are uprighted by R_g^T.
    """
    if up_vector is None:
        return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), batch_shape + (3, 3))
    n = jnp.asarray(up_vector, jnp.float32)[..., :3]
    minus_y = jnp.array([0.0, -1.0, 0.0], jnp.float32)
    dot = jnp.sum(minus_y * n, axis=-1, keepdims=True)
    n = jnp.where(dot <= 0, -n, n)
    return rotation_matrix_from_vectors(jnp.broadcast_to(minus_y, n.shape), n)


@f32_precision
def estimate_bbox(
    points: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    up_vector: jnp.ndarray | None = None,
    method: str = "pca",
    *,
    num_angles: int = 128,
    f16_vertices: bool = True,
    compat_center_bug: bool = False,
    yaw_override: jnp.ndarray | None = None,
) -> BoxEstimate:
    """Fit a ground-aligned oriented 3D box to one point set; see module doc.

    Args:
      points: (N, 3) camera-space points (padded slots allowed).
      valid: (N,) bool; also treats non-finite points as invalid.
      up_vector: (3,) canonical upright direction (or a plane's [a,b,c,(d)]),
        as produced by stage 7 (`src/batch_scripts/whole.py:121-122`).
      method: 'pca' (default, reference default) or 'minarea' (the
        convex-hull/rotating-calipers equivalent).
      yaw_override: precomputed yaw(s) in the upright frame — used by
        `fit_boxes_batch(method='minarea_pallas')`, which runs the Pallas
        VMEM yaw kernel over the whole instance batch first.
    """
    points = jnp.asarray(points, jnp.float32)
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    valid = finite if valid is None else (jnp.asarray(valid, bool) & finite)
    ok = jnp.any(valid, axis=-1)
    safe_pts = jnp.where(valid[..., None], points, 0.0)

    r_g = upright_rotation(up_vector, batch_shape=points.shape[:-2])
    # Reference: rotated_pc = in_pc @ R_g == R_g^T applied to each point.
    upright = jnp.einsum("...nj,...ji->...ni", safe_pts, r_g)

    if yaw_override is not None:
        yaw = jnp.asarray(yaw_override, jnp.float32)
    elif method == "pca":
        yaw = estimate_yaw_pca(upright[..., [0, 2]], valid)
    elif method in ("minarea", "convex_hull"):
        yaw = estimate_yaw_minarea(upright[..., [0, 2]], valid, num_angles=num_angles)
    else:
        raise ValueError(f"Unknown method: {method}. Use 'pca' or 'minarea'.")

    r_yaw = rotate_y(yaw)
    aligned = jnp.einsum("...ij,...nj->...ni", r_yaw, upright)
    mins = masked_min(aligned, valid[..., None], axis=-2)
    maxs = masked_max(aligned, valid[..., None], axis=-2)
    dims_xyz = maxs - mins
    center_aligned = 0.5 * (mins + maxs)

    verts = convert_box_vertices(center_aligned, dims_xyz, jnp.zeros_like(yaw))
    if f16_vertices:
        verts = verts.astype(jnp.float16).astype(jnp.float32)  # src/util_3dbox.py:165
    r_back = rotate_y(-yaw)
    verts = jnp.einsum("...ij,...nj->...ni", r_back, verts)
    verts = jnp.einsum("...ij,...nj->...ni", r_g, verts)

    if compat_center_bug:
        # Reference uses R_g^T here, inconsistent with the vertices above
        # (src/util_3dbox.py:173-176); reproduced only on request.
        inv_map = jnp.swapaxes(r_g, -1, -2)
    else:
        inv_map = r_g
    center_cam = jnp.einsum("...ij,...j->...i", inv_map @ r_back, center_aligned)
    r_cam = inv_map @ r_back

    dimensions = jnp.stack(
        [dims_xyz[..., 2], dims_xyz[..., 1], dims_xyz[..., 0]], axis=-1
    )  # [dz, dy, dx], src/util_3dbox.py:175
    return BoxEstimate(
        vertices=verts,
        center_cam=center_cam,
        dimensions=dimensions,
        R_cam=r_cam,
        yaw=yaw,
        ok=ok,
    )


def fit_boxes_batch(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    up_vectors: jnp.ndarray | None = None,
    method: str = "pca",
    **kwargs,
) -> BoxEstimate:
    """Vectorized `estimate_bbox` over (I, N, 3) instance point sets.

    This is the batched replacement for the reference's per-object loop in
    `src/util_3dbox.py:231-294`; wrap in `jax.jit` (or a pjit'ed pipeline
    step) so every instance in the image batch fits in one XLA program.

    method='minarea_pallas' runs the min-area yaw search in the Pallas
    VMEM kernel over the whole batch first (TPU only; ~12x the jnp
    two-stage search), then finishes extents/vertices as usual.
    """
    if method == "minarea_pallas":
        from labelany3d_tpu.ops.boxfit_pallas import yaw_minarea_pallas

        points = jnp.asarray(points, jnp.float32)
        finite = jnp.all(jnp.isfinite(points), axis=-1)
        v = jnp.asarray(valid, bool) & finite
        safe = jnp.where(v[..., None], points, 0.0)
        r_g = jax.vmap(lambda u: upright_rotation(u))(up_vectors) if up_vectors is not None \
            else jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), points.shape[:1] + (3, 3))
        upright = jnp.einsum("inj,ijk->ink", safe, r_g)  # R_g^T per point
        yaws = yaw_minarea_pallas(upright[..., [0, 2]], v)
        fn_y = lambda p, vv, u, y: estimate_bbox(
            p, vv, u, method="minarea", yaw_override=y, **kwargs
        )
        ups = up_vectors if up_vectors is not None else jnp.zeros((points.shape[0], 3))
        if up_vectors is None:
            fn_y = lambda p, vv, u, y: estimate_bbox(
                p, vv, None, method="minarea", yaw_override=y, **kwargs
            )
        return jax.vmap(fn_y)(points, valid, ups, yaws)

    fn = lambda p, v, u: estimate_bbox(p, v, u, method=method, **kwargs)
    if up_vectors is None:
        fn_nu = lambda p, v: estimate_bbox(p, v, None, method=method, **kwargs)
        return jax.vmap(fn_nu)(points, valid)
    return jax.vmap(fn)(points, valid, up_vectors)
