"""Tile-based 3D Gaussian splat rasterizer (forward).

Replaces `diff-gaussian-rasterization` (SURVEY.md §2B): the reference uses
the CUDA tile rasterizer for DreamGaussian and for TRELLIS's 100-view
texture bake (`trellis/utils/postprocessing_utils.py:443`). The label
pipeline never backpropagates through rendering, so the forward pass
suffices (JAX would differentiate this implementation anyway — it is pure
jnp).

Design (same structure as the CUDA original, static shapes):
  1. project Gaussians: EWA splatting — 2D covariance
     J W Sigma W^T J^T (+0.3 px low-pass, as the original);
  2. coarse: per-tile Gaussian lists by bbox overlap, nearest-`cap` by
     depth (deterministic);
  3. fine: per-pixel alpha compositing front-to-back via cumulative
     transmittance (one cumprod instead of a sequential loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from labelany3d_tpu.utils.precision import f32_precision


class SplatOut(NamedTuple):
    rgb: jnp.ndarray     # (H, W, 3)
    alpha: jnp.ndarray   # (H, W)
    depth: jnp.ndarray   # (H, W) alpha-weighted expected depth


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotations."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


@f32_precision
def rasterize_gaussians(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    K: jnp.ndarray,
    image_size: tuple[int, int],
    tile: int = 16,
    gaussians_per_tile: int = 256,
    sigma_cutoff: float = 3.0,
) -> SplatOut:
    """Render N Gaussians; OpenCV camera convention (x right, y down, z fwd).

    means (N,3) world; scales (N,3) stddevs; rotations (N,4) wxyz;
    opacities (N,); colors (N,3) in [0,1].
    """
    h, w = image_size
    means = jnp.asarray(means, jnp.float32)
    n = means.shape[0]

    cam = means @ R.T + t  # (N, 3)
    z = jnp.maximum(cam[:, 2], 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * cam[:, 0] / z + cx
    v = fy * cam[:, 1] / z + cy
    in_front = cam[:, 2] > 1e-4

    # 3D covariance: R_q diag(s^2) R_q^T, then EWA projection to 2D.
    Rq = quat_to_rotmat(jnp.asarray(rotations, jnp.float32))
    S2 = jnp.asarray(scales, jnp.float32) ** 2
    cov3 = jnp.einsum("nij,nj,nkj->nik", Rq, S2, Rq)
    covw = jnp.einsum("ij,njk,lk->nil", R, cov3, R)  # world->cam rotate
    # Projection Jacobian J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    invz = 1.0 / z
    J = jnp.stack(
        [
            jnp.stack([fx * invz, jnp.zeros_like(z), -fx * cam[:, 0] * invz**2], -1),
            jnp.stack([jnp.zeros_like(z), fy * invz, -fy * cam[:, 1] * invz**2], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    cov2 = jnp.einsum("nij,njk,nlk->nil", J, covw, J)  # (N, 2, 2)
    cov2 = cov2 + 0.3 * jnp.eye(2)  # low-pass, parity with the CUDA original

    det = cov2[:, 0, 0] * cov2[:, 1, 1] - cov2[:, 0, 1] * cov2[:, 1, 0]
    det = jnp.maximum(det, 1e-12)
    inv = jnp.stack(
        [
            jnp.stack([cov2[:, 1, 1], -cov2[:, 0, 1]], -1),
            jnp.stack([-cov2[:, 1, 0], cov2[:, 0, 0]], -1),
        ],
        axis=-2,
    ) / det[:, None, None]
    # Screen radius = cutoff * sqrt(max eigenvalue).
    mid = 0.5 * (cov2[:, 0, 0] + cov2[:, 1, 1])
    lam = mid + jnp.sqrt(jnp.maximum(mid**2 - det, 0.0))
    radius = sigma_cutoff * jnp.sqrt(jnp.maximum(lam, 0.0))

    big = jnp.float32(1e9)
    x0 = jnp.where(in_front, u - radius, big)
    x1 = jnp.where(in_front, u + radius, -big)
    y0 = jnp.where(in_front, v - radius, big)
    y1 = jnp.where(in_front, v + radius, -big)

    ty, tx = h // tile, w // tile
    tiles_y0 = jnp.arange(ty, dtype=jnp.float32) * tile
    tiles_x0 = jnp.arange(tx, dtype=jnp.float32) * tile
    ov_y = (y0[None, :] <= tiles_y0[:, None] + tile) & (y1[None, :] >= tiles_y0[:, None])
    ov_x = (x0[None, :] <= tiles_x0[:, None] + tile) & (x1[None, :] >= tiles_x0[:, None])
    overlap = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(ty * tx, n)

    cap = min(gaussians_per_tile, n)
    # Nearest-by-depth capped tile lists, then front-to-back order.
    score = jnp.where(overlap, -z[None, :], -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, cap)  # farthest-last? top_k on -z = nearest first
    tile_valid = jnp.isfinite(top_score)
    order = jnp.argsort(-top_score, axis=-1)  # sort by -(-z) asc -> nearest first
    top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
    tile_valid = jnp.take_along_axis(tile_valid, order, axis=-1)
    g_idx = jnp.where(tile_valid, top_idx, 0)

    cols = jnp.asarray(colors, jnp.float32)
    op = jnp.asarray(opacities, jnp.float32)

    def raster_tile(t_id, idx, ok):
        ty_i = t_id // tx
        tx_i = t_id % tx
        py = ty_i * tile + jnp.arange(tile, dtype=jnp.float32) + 0.5
        px = tx_i * tile + jnp.arange(tile, dtype=jnp.float32) + 0.5
        pyy, pxx = jnp.meshgrid(py, px, indexing="ij")
        P = tile * tile
        pxx = pxx.reshape(P, 1)
        pyy = pyy.reshape(P, 1)

        du = pxx - u[idx][None]         # (P, C)
        dv = pyy - v[idx][None]
        a = inv[idx][:, 0, 0][None]
        b = inv[idx][:, 0, 1][None]
        c = inv[idx][:, 1, 1][None]
        power = -0.5 * (a * du * du + 2 * b * du * dv + c * dv * dv)
        alpha = jnp.minimum(op[idx][None] * jnp.exp(power), 0.999)
        alpha = jnp.where(ok[None, :] & (power > -0.5 * sigma_cutoff**2), alpha, 0.0)

        # Front-to-back compositing: T_i = prod_{j<i} (1 - alpha_j).
        trans = jnp.cumprod(1.0 - alpha, axis=-1)
        T_before = jnp.concatenate([jnp.ones((P, 1)), trans[:, :-1]], axis=-1)
        wgt = alpha * T_before  # (P, C)
        rgb = wgt @ cols[idx]
        acc = jnp.sum(wgt, axis=-1)
        dep = wgt @ z[idx]
        return (
            rgb.reshape(tile, tile, 3),
            acc.reshape(tile, tile),
            dep.reshape(tile, tile),
        )

    t_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    rgb, acc, dep = jax.vmap(raster_tile)(t_ids, g_idx, tile_valid)
    rgb = rgb.reshape(ty, tx, tile, tile, 3).transpose(0, 2, 1, 3, 4).reshape(h, w, 3)
    acc = acc.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    dep = dep.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    return SplatOut(rgb=rgb, alpha=acc, depth=dep)
