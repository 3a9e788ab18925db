"""Focal-length & z-shift recovery from affine point maps (MoGe-style).

Parity target: `external/MoGe/moge/utils/geometry_torch.py:112-160` +
`geometry_numpy.py:75-108` in the reference tree, which downsample the point
map to 64x64, ship it to host, and run scipy Levenberg-Marquardt per image on
the 1-D objective

    min_shift  | f(shift) * xy/(z+shift) - uv |^2,
    f(shift) = sum(xy_proj . uv) / sum(|xy_proj|^2)   (optimal focal).

TPU-native replacement: the objective is smooth and 1-D in `shift`, so a
dense candidate grid (bracketing the positivity constraint z + shift > 0)
followed by fixed-iteration golden-section refinement solves it entirely
on-device and batches over images — no host round-trip in the depth stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_view_plane_uv(width: int, height: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) uv with corners at +-(w, h)/diagonal (MoGe convention).

    Parity: `geometry_torch.py:40-53` (pixel centers, linspace over
    +-span*(n-1)/n).
    """
    aspect = width / height
    span_x = aspect / (1.0 + aspect**2) ** 0.5
    span_y = 1.0 / (1.0 + aspect**2) ** 0.5
    u = jnp.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width, dtype=dtype)
    v = jnp.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)


def _nearest_downsample(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') semantics: src = floor(dst * s/d).

    x: (..., H, W, C) or (..., H, W).
    """
    if x.ndim >= 3 and x.shape[-1] <= 4:  # channels-last data
        h, w = x.shape[-3], x.shape[-2]
        th, tw = size
        ys = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
        xs = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
        return x[..., ys[:, None], xs[None, :], :]
    h, w = x.shape[-2], x.shape[-1]
    th, tw = size
    ys = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    return x[..., ys[:, None], xs[None, :]]


def _objective(shift, xy, z, uv, w, focal=None):
    """Masked SSE of f * xy/(z+shift) - uv; returns (cost, focal).

    shift: (...,) broadcasting against z (..., N).
    """
    denom = z + jnp.asarray(shift)[..., None]
    safe = jnp.abs(denom) > 1e-12
    denom = jnp.where(safe, denom, 1e-12)
    proj = xy / denom[..., None]
    proj = jnp.where((safe & (w > 0))[..., None], proj, 0.0)
    uv_m = jnp.where((w > 0)[..., None], uv, 0.0)
    if focal is None:
        num = jnp.sum(proj * uv_m, axis=(-2, -1))
        den = jnp.maximum(jnp.sum(proj * proj, axis=(-2, -1)), 1e-12)
        focal = num / den
    err = focal[..., None, None] * proj - uv_m
    cost = jnp.sum(err * err, axis=(-2, -1))
    return cost, focal


def recover_focal_shift(
    points: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    focal: jnp.ndarray | None = None,
    downsample_size: tuple[int, int] = (64, 64),
    num_candidates: int = 64,
    refine_iters: int = 24,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (focal, shift) from (..., H, W, 3) affine point maps.

    `focal` is relative to half the image diagonal (MoGe convention). Fully
    batched; `mask` marks valid pixels. When `focal` is given only the shift
    is solved (DepthPro-conditioned path).
    """
    points = jnp.asarray(points, jnp.float32)
    height, width = points.shape[-3], points.shape[-2]
    uv_full = normalized_view_plane_uv(width, height)

    pts_lr = _nearest_downsample(points, downsample_size)
    uv_lr = _nearest_downsample(uv_full, downsample_size)
    if mask is None:
        w = jnp.ones(pts_lr.shape[:-1], jnp.float32)
    else:
        m = _nearest_downsample(jnp.asarray(mask, jnp.float32), downsample_size)
        w = (m > 0).astype(jnp.float32)

    batch = pts_lr.shape[:-3]
    p = pts_lr.reshape(batch + (-1, 3))
    uv = jnp.broadcast_to(uv_lr.reshape(-1, 2), batch + (uv_lr.size // 2, 2))
    wf = w.reshape(batch + (-1,))
    xy = p[..., :2]
    z = p[..., 2]

    # Positivity bracket: shift > -min(z over valid). Candidates sweep from
    # just above the bound to a generous multiple of the depth range.
    big = jnp.float32(3.4e38)
    zmin = jnp.min(jnp.where(wf > 0, z, big), axis=-1)
    zmax = jnp.max(jnp.where(wf > 0, z, -big), axis=-1)
    zrange = jnp.maximum(zmax - zmin, 1e-3)
    lo = -zmin + 1e-4
    hi = lo + 10.0 * zrange
    ts = jnp.linspace(0.0, 1.0, num_candidates)
    cands = lo[..., None] + (hi - lo)[..., None] * (ts**2)  # denser near the bound

    def eval_cost(s):
        c, _ = _objective(s, xy, z, uv, wf, focal=focal)
        return c

    costs = jax.vmap(eval_cost, in_axes=-1, out_axes=-1)(cands)
    best = jnp.argmin(costs, axis=-1)
    step = (hi - lo) / (num_candidates - 1)
    a = jnp.take_along_axis(cands, jnp.maximum(best - 1, 0)[..., None], axis=-1)[..., 0]
    b = jnp.take_along_axis(
        cands, jnp.minimum(best + 1, num_candidates - 1)[..., None], axis=-1
    )[..., 0]
    a = jnp.maximum(a, lo)

    # Golden-section refinement on [a, b] — fixed iterations, batched.
    gr = 0.6180339887498949

    def gs_step(carry, _):
        a, b = carry
        x1 = b - gr * (b - a)
        x2 = a + gr * (b - a)
        f1 = eval_cost(x1)
        f2 = eval_cost(x2)
        a_new = jnp.where(f1 < f2, a, x1)
        b_new = jnp.where(f1 < f2, x2, b)
        return (a_new, b_new), None

    (a, b), _ = jax.lax.scan(gs_step, (a, b), None, length=refine_iters)
    shift = 0.5 * (a + b)
    cost, focal_out = _objective(shift, xy, z, uv, wf, focal=focal)
    del cost
    if focal is not None:
        focal_out = jnp.broadcast_to(jnp.asarray(focal, jnp.float32), shift.shape)
    return focal_out, shift


def intrinsics_from_diag_focal(focal: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Normalized intrinsics from a half-diagonal-relative focal.

    Parity: `moge_model.py:352-356` — fx = focal/2 * sqrt(1+ar^2)/ar,
    fy = focal/2 * sqrt(1+ar^2), principal point (0.5, 0.5).
    """
    aspect = width / height
    diag = (1.0 + aspect**2) ** 0.5
    fx = focal / 2.0 * diag / aspect
    fy = focal / 2.0 * diag
    half = jnp.full_like(fx, 0.5)
    from labelany3d_tpu.geometry.camera import intrinsics_from_focal_center

    return intrinsics_from_focal_center(fx, fy, half, half)
