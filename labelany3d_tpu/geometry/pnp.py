"""Perspective-n-Point: batched DLT + Gauss-Newton + hypothesis-batch RANSAC.

Parity target: `src/matching/pose_estimator.py:11-64` in the reference repo,
which calls `cv2.solvePnPRansac` (1000 sequential iterations, 20 px
reprojection threshold, confidence 0.99, SOLVEPNP_ITERATIVE) on host.

TPU-native replacement: RANSAC with a *fixed hypothesis batch* — T minimal
6-point subsets are gathered, solved in parallel by DLT (a 12x12
eigenproblem each), scored by a (T, N) reprojection-error matrix, and the
winner's inliers are polished with a fixed-iteration damped Gauss-Newton on
SE(3). Everything is static-shape and vmappable over objects, so stage 7's
per-object PnP loop becomes one XLA program over all instances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision

from labelany3d_tpu.geometry.transforms import so3_exp


def _smallest_eigvec_12(ata: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Near-null eigenvector of a batched PSD (..., 12, 12) DLT normal
    matrix by shifted inverse iteration: one Cholesky factorization +
    `iters` reused triangular-solve sweeps.

    XLA's `eigh` lowers to an iterative Jacobi while-loop that measured
    3.85 ms/pair (HBM-bound) on the v5e registration profile — ~10x the
    cost of this scheme (2.15 ms for 20 RANSAC solves incl. dispatch vs
    25 ms, micro-benched at (256, 12, 12)). DLT minimal samples make
    inverse iteration reliable: a 6-point system has 12 homogeneous
    equations whose smallest singular value is noise-scale, far below the
    rest, so the shifted solve amplifies exactly the null direction.
    Near-degenerate samples (lambda_1 ~ lambda_2) may converge to a
    different vector of the same near-null subspace than eigh — an
    equally-scored RANSAC hypothesis; end-to-end `solve_pnp_ransac`
    rotation/translation errors are statistically identical (40-scene
    harness, 30% outliers, 1.5 px noise)."""
    from jax.lax.linalg import triangular_solve

    eye = jnp.eye(ata.shape[-1], dtype=ata.dtype)
    eps = 1e-6 * jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None] + 1e-12
    chol = jnp.linalg.cholesky(ata + eps * eye)
    x = jnp.ones(ata.shape[:-1] + (1,), ata.dtype)
    for _ in range(iters):
        y = triangular_solve(chol, x, left_side=True, lower=True)
        x = triangular_solve(chol, y, left_side=True, lower=True, transpose_a=True)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-2, keepdims=True), 1e-20)
    return x[..., 0]


class PnPResult(NamedTuple):
    rotation: jnp.ndarray     # (..., 3, 3) world->camera
    translation: jnp.ndarray  # (..., 3)
    inliers: jnp.ndarray      # (..., N) bool
    error: jnp.ndarray        # mean reprojection error, cv2.norm semantics
    ok: jnp.ndarray           # (...) bool


def _project(points: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    cam = jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]
    z = cam[..., 2:3]
    z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    xy = cam[..., :2] / z
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


@f32_precision
def reprojection_error(
    obj_pts: jnp.ndarray, img_pts: jnp.ndarray, K: jnp.ndarray,
    R: jnp.ndarray, t: jnp.ndarray, valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """cv2-style error: ||all residuals||_2 / N (src/matching/pose_estimator.py:50-58)."""
    proj = _project(obj_pts, K, R, t)
    diff = proj - img_pts
    if valid is not None:
        diff = jnp.where(valid[..., None], diff, 0.0)
        n = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    else:
        n = obj_pts.shape[-2]
    return jnp.sqrt(jnp.sum(diff * diff, axis=(-2, -1))) / n


@f32_precision
def solve_pnp_dlt(
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    K: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direct linear transform for the projection matrix; returns (R, t).

    obj_pts (..., N, 3), img_pts (..., N, 2) pixels. Needs N >= 6. Solves the
    12-dim null problem via shifted inverse iteration on A^T A (batched,
    `_smallest_eigvec_12`; was `eigh` — 10x the cost), orthonormalizes the
    rotation by SVD, and fixes the global sign by majority cheirality.
    """
    obj = jnp.asarray(obj_pts, jnp.float32)
    img = jnp.asarray(img_pts, jnp.float32)
    Kinv = jnp.linalg.inv(jnp.asarray(K, jnp.float32))
    ones = jnp.ones(img.shape[:-1] + (1,), jnp.float32)
    norm = jnp.einsum("...ij,...nj->...ni", Kinv, jnp.concatenate([img, ones], axis=-1))
    u = norm[..., 0]
    v = norm[..., 1]

    xh = jnp.concatenate([obj, ones], axis=-1)  # (..., N, 4)
    zero = jnp.zeros_like(xh)
    row_u = jnp.concatenate([xh, zero, -u[..., None] * xh], axis=-1)  # (..., N, 12)
    row_v = jnp.concatenate([zero, xh, -v[..., None] * xh], axis=-1)
    a = jnp.concatenate([row_u, row_v], axis=-2)  # (..., 2N, 12)
    if weights is not None:
        w = jnp.asarray(weights, jnp.float32)
        a = a * jnp.concatenate([w, w], axis=-1)[..., None]
    ata = jnp.einsum("...ni,...nj->...ij", a, a)
    p = _smallest_eigvec_12(ata)  # near-null vector (was eigh, 10x cost)
    P = p.reshape(p.shape[:-1] + (3, 4))

    M = P[..., :3]
    uM, sM, vMt = jnp.linalg.svd(M)
    scale = jnp.maximum(jnp.mean(sM, axis=-1), 1e-12)
    det = jnp.linalg.det(uM @ vMt)
    ones2 = jnp.ones(det.shape + (2,), jnp.float32)
    # Pose from +P: R = U diag(1,1,det) V^T.
    d_pos = jnp.concatenate([ones2, det[..., None]], axis=-1)
    R_pos = jnp.einsum("...ik,...k,...kj->...ij", uM, d_pos, vMt)
    t_pos = P[..., 3] / scale[..., None]
    # Pose from -P: since -M = (-U) S V^T, R = (-U) diag(1,1,-det) V^T.
    d_neg = jnp.concatenate([ones2, -det[..., None]], axis=-1)
    R_neg = jnp.einsum("...ik,...k,...kj->...ij", -uM, d_neg, vMt)
    t_neg = -t_pos

    # The DLT null vector has a global sign ambiguity (P vs -P). Pick the
    # sign placing the majority of the points in front of the camera.
    def front_count(R, t):
        cam_z = (jnp.einsum("...ij,...nj->...ni", R, obj) + t[..., None, :])[..., 2]
        return jnp.sum(cam_z > 0, axis=-1)

    use_neg = front_count(R_neg, t_neg) > front_count(R_pos, t_pos)
    R = jnp.where(use_neg[..., None, None], R_neg, R_pos)
    t = jnp.where(use_neg[..., None], t_neg, t_pos)
    return R, t


@f32_precision
def refine_pose_gauss_newton(
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    K: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    iterations: int = 10,
    damping: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton on SE(3) minimizing weighted reprojection error.

    Left-multiplicative so(3) parameterization; fixed iteration count keeps
    the program static for jit/vmap.
    """
    obj = jnp.asarray(obj_pts, jnp.float32)
    img = jnp.asarray(img_pts, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    w = jnp.ones(obj.shape[:-1], jnp.float32) if weights is None else jnp.asarray(weights, jnp.float32)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]

    def step(carry, _):
        R, t = carry
        cam = jnp.einsum("...ij,...nj->...ni", R, obj) + t[..., None, :]
        z = jnp.where(jnp.abs(cam[..., 2]) > 1e-9, cam[..., 2], 1e-9)
        inv_z = 1.0 / z
        px, py = cam[..., 0], cam[..., 1]
        u = fx[..., None] * px * inv_z + K[..., 0, 2][..., None]
        v = fy[..., None] * py * inv_z + K[..., 1, 2][..., None]
        r_u = u - img[..., 0]
        r_v = v - img[..., 1]

        # d(u,v)/d(cam point)
        du_dp = jnp.stack(
            [fx[..., None] * inv_z, jnp.zeros_like(inv_z), -fx[..., None] * px * inv_z**2],
            axis=-1,
        )
        dv_dp = jnp.stack(
            [jnp.zeros_like(inv_z), fy[..., None] * inv_z, -fy[..., None] * py * inv_z**2],
            axis=-1,
        )
        # Pose perturbation about the camera frame: cam' = exp(w) cam + dt,
        # so d cam / d w = -[cam]_x and the row Jacobian is
        # dp @ (-[cam]_x) = -(dp x cam); d cam / d dt = I.
        j_om_u = -jnp.cross(du_dp, cam)
        j_om_v = -jnp.cross(dv_dp, cam)
        J_u = jnp.concatenate([j_om_u, du_dp], axis=-1)  # (..., N, 6)
        J_v = jnp.concatenate([j_om_v, dv_dp], axis=-1)
        J = jnp.concatenate([J_u, J_v], axis=-2)  # (..., 2N, 6)
        r = jnp.concatenate([r_u, r_v], axis=-1)  # (..., 2N)
        ww = jnp.concatenate([w, w], axis=-1)

        JtJ = jnp.einsum("...ni,...n,...nj->...ij", J, ww, J)
        Jtr = jnp.einsum("...ni,...n,...n->...i", J, ww, r)
        lam = damping * jnp.maximum(jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None, None] / 6.0, 1e-12)
        H = JtJ + lam * jnp.eye(6, dtype=jnp.float32)
        delta = -jnp.linalg.solve(H, Jtr[..., None])[..., 0]
        dR = so3_exp(delta[..., :3])
        R_new = dR @ R
        t_new = jnp.einsum("...ij,...j->...i", dR, t) + delta[..., 3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32)),
                             None, length=iterations)
    return R, t


@f32_precision
def solve_pnp_ransac(
    obj_pts: jnp.ndarray,
    img_pts: jnp.ndarray,
    K: jnp.ndarray,
    valid: jnp.ndarray,
    key,
    *,
    num_trials: int = 256,
    sample_size: int = 6,
    reproj_threshold: float = 20.0,
    refine_iterations: int = 10,
    min_inliers: int = 6,
) -> PnPResult:
    """Hypothesis-batch RANSAC PnP over one flat correspondence set.

    Matches the role (and threshold/flag defaults) of
    `src/matching/pose_estimator.py:33-47`; vmap over objects for stage 7.
    """
    obj = jnp.asarray(obj_pts, jnp.float32)
    img = jnp.asarray(img_pts, jnp.float32)
    valid = jnp.asarray(valid, bool)
    n = obj.shape[-2]
    n_valid = jnp.sum(valid)

    # Sample trial indices among valid correspondences (inverse-CDF trick).
    cdf = jnp.cumsum(valid.astype(jnp.int32))
    draws = jax.random.randint(key, (num_trials, sample_size), 0, jnp.maximum(n_valid, 1))
    idx = jnp.searchsorted(cdf, draws, side="right").astype(jnp.int32)
    t_obj = obj[idx]  # (T, S, 3)
    t_img = img[idx]

    R_t, t_t = jax.vmap(lambda o, i: solve_pnp_dlt(o, i, K))(t_obj, t_img)

    proj = _project(obj[None], K, R_t, t_t)  # (T, N, 2)
    err = jnp.linalg.norm(proj - img[None], axis=-1)
    inl = (err < reproj_threshold) & valid[None, :]
    score = jnp.sum(inl, axis=-1)
    best = jnp.argmax(score)
    R_best, t_best = R_t[best], t_t[best]
    best_inliers = inl[best]

    enough = score[best] >= min_inliers
    w = jnp.where(best_inliers, 1.0, 0.0)
    R_ref, t_ref = refine_pose_gauss_newton(
        obj, img, K, R_best, t_best, weights=w, iterations=refine_iterations
    )
    # Recompute inliers under the refined pose (cv2 reports RANSAC inliers of
    # the refined model).
    proj_ref = _project(obj, K, R_ref, t_ref)
    err_ref = jnp.linalg.norm(proj_ref - img, axis=-1)
    inliers = (err_ref < reproj_threshold) & valid
    error = reprojection_error(obj, img, K, R_ref, t_ref, valid=valid)
    ok = enough & (n_valid >= sample_size)
    return PnPResult(rotation=R_ref, translation=t_ref, inliers=inliers, error=error, ok=ok)
