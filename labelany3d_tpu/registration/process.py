"""Object-to-scene registration loop (process_image_space equivalent).

Parity target: `src/matching/process_image_space.py:34-159` +
`src/util.py:464-493` in the reference repo:

  1. render 8 orbit views of the generated object mesh at the stage-5
     elevation;
  2. match the real crop against every view; lift render matches to object
     space through the render depth;
  3. PnP (render intrinsics) -> initial pose; re-render, re-match, map crop
     pixels to full-image pixels through the crop params;
  4. PnP (image intrinsics) -> final pose + a full-image render;
  5. scale = median(scene_depth / render_depth) on the mask overlap;
  6. transform = s * [R | t] placing the object in camera space.

Convention note: the reference computes `transform[:3,:3] = inv(R) * s`
(`util.py:491`) because PyTorch3D returns row-convention rotations; our
cameras are OpenCV column-convention end-to-end, so the transform is simply
`s * [R | t]` — same placement, no inverse.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.data.meshio import Mesh
from labelany3d_tpu.geometry.align import median_ratio_scale
from labelany3d_tpu.geometry.pnp import solve_pnp_ransac
from labelany3d_tpu.registration.cameras import RENDER_K, RENDER_SIZE
from labelany3d_tpu.registration.renderer import OrbitRenderer, RenderedView

# Eagerly, the 256-trial RANSAC body is hundreds of per-op dispatches per
# call (two calls per object; over the tunnel each op is a round trip).
# Match counts are static (strided query grids + valid masks), so this
# caches exactly one program per stage (8V*S and S correspondences).
_pnp_jitted = jax.jit(
    solve_pnp_ransac,
    static_argnames=(
        "num_trials", "sample_size", "reproj_threshold",
        "refine_iterations", "min_inliers",
    ),
)
_median_scale_jitted = jax.jit(median_ratio_scale)


class MatcherBackend(Protocol):
    """2D-2D correspondences between the reference crop and one render.

    Returns (xy_ref (S, 2), xy_view (S, 2), valid (S,)) in pixel coords.
    Implementations: `models.matcher.match_images` (production) or
    geometry-oracle fakes (tests).

    Backends may additionally provide `match_batch(ref_rgba, views)` —
    the same matches for a whole orbit in ONE batched model forward
    (the reference runs 8 sequential bs=1 MASt3R calls per object,
    `process_image_space.py:72-101`; on TPU batch-8 amortizes the MXU).
    `register_object` uses it when present.
    """

    def match(self, ref_rgba: np.ndarray, view: RenderedView):
        ...


@dataclass
class RegistrationResult:
    rotation: np.ndarray        # (3, 3) object->camera
    translation: np.ndarray     # (3,)
    scale: float
    transform: np.ndarray       # (4, 4) = s * [R | t]
    render_depth: np.ndarray    # full-image render depth at the final pose
    render_mask: np.ndarray     # full-image coverage
    num_inliers: int
    error: float
    ok: bool


def _lift_matches_to_object(view: RenderedView, xy_view: np.ndarray, valid: np.ndarray,
                            K: np.ndarray):
    """Render-pixel matches -> object-space 3D points via the render depth.

    Parity: `src/matching/matcher.py:71-91` (depth lift + world transform),
    without the PyTorch3D coordinate flips.
    """
    h, w = view.depth.shape
    xi = np.clip(np.round(xy_view[:, 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(xy_view[:, 1]).astype(int), 0, h - 1)
    d = view.depth[yi, xi]
    valid = valid & (d > 0)
    Kinv = np.linalg.inv(K)
    pix = np.stack([xy_view[:, 0] * d, xy_view[:, 1] * d, d], axis=-1)
    cam = pix @ Kinv.T
    world = (cam - view.t) @ view.R  # R^T @ (cam - t), row-vectorized
    return world.astype(np.float32), valid


def register_object(
    mesh: Mesh,
    ref_crop_rgba: np.ndarray,
    elevation_deg: float,
    crop_params: tuple[float, float, float],
    K_img: np.ndarray,
    image_hw: tuple[int, int],
    scene_depth: np.ndarray,
    scene_mask: np.ndarray,
    matcher: MatcherBackend,
    key=None,
    renderer: OrbitRenderer | None = None,
    reproj_threshold: float = 20.0,
) -> RegistrationResult:
    """Register one generated mesh into the scene; see module docstring."""
    if key is None:
        key = jax.random.PRNGKey(0)
    renderer = renderer or OrbitRenderer()

    # Stage A: 8 orbit views at the estimated elevation (process_image_space
    # :47-50 — elevations = [-elev]*8, azimuths = 0..315).
    elevations = [-elevation_deg] * 8
    azimuths = list(range(0, 360, 45))
    views = renderer.render_orbit_views(mesh, elevations, azimuths)

    if hasattr(matcher, "match_batch"):
        matches = matcher.match_batch(ref_crop_rgba, views)
    else:
        matches = [matcher.match(ref_crop_rgba, view) for view in views]
    obj_pts, img_pts, valids = [], [], []
    for view, (xy_ref, xy_view, valid) in zip(views, matches):
        world, valid = _lift_matches_to_object(view, xy_view, valid, renderer.K)
        obj_pts.append(world)
        img_pts.append(xy_ref.astype(np.float32))
        valids.append(valid)
    obj_all = np.concatenate(obj_pts)
    img_all = np.concatenate(img_pts)
    valid_all = np.concatenate(valids)

    k1, k2 = jax.random.split(key)
    res1 = _pnp_jitted(
        jnp.asarray(obj_all), jnp.asarray(img_all), jnp.asarray(renderer.K),
        jnp.asarray(valid_all), k1, reproj_threshold=reproj_threshold,
    )
    if not bool(res1.ok):
        return RegistrationResult(
            rotation=np.eye(3), translation=np.zeros(3), scale=1.0,
            transform=np.eye(4), render_depth=np.full(image_hw, -1.0),
            render_mask=np.zeros(image_hw, bool), num_inliers=0,
            error=float("inf"), ok=False,
        )

    # Stage B: re-render at the estimated pose, re-match, solve against the
    # full-image intrinsics (process_image_space :104-159).
    R1 = np.asarray(res1.rotation)
    t1 = np.asarray(res1.translation)
    view1 = renderer.render_pose(mesh, R1, t1)
    xy_ref, xy_view, valid = matcher.match(ref_crop_rgba, view1)
    world, valid = _lift_matches_to_object(view1, xy_view, valid, renderer.K)
    ox, oy, scale_crop = crop_params
    xy_img = xy_ref / scale_crop + np.array([[ox, oy]])  # crop px -> image px

    res2 = _pnp_jitted(
        jnp.asarray(world), jnp.asarray(xy_img.astype(np.float32)),
        jnp.asarray(K_img, jnp.float32), jnp.asarray(valid), k2,
        reproj_threshold=reproj_threshold,
    )
    if not bool(res2.ok):
        res2 = res1
        K_final = renderer.K
    else:
        K_final = np.asarray(K_img, np.float32)

    R2 = np.asarray(res2.rotation)
    t2 = np.asarray(res2.translation)
    final = renderer.render_pose(mesh, R2, t2, image_size=image_hw, K=K_final)
    render_mask = final.depth > 0

    # Stage C: median-ratio metric scale (util.py:478-486).
    overlap = scene_mask & render_mask
    s, has_overlap = _median_scale_jitted(
        jnp.asarray(scene_depth, jnp.float32), jnp.asarray(final.depth, jnp.float32),
        jnp.asarray(overlap),
    )
    scale = float(s) if bool(has_overlap) else 1.0
    transform = np.eye(4)
    if bool(has_overlap):
        transform[:3, :3] = R2 * scale
        transform[:3, 3] = t2 * scale

    return RegistrationResult(
        rotation=R2,
        translation=t2,
        scale=scale,
        transform=transform,
        render_depth=final.depth,
        render_mask=render_mask,
        num_inliers=int(np.asarray(res2.inliers).sum()),
        error=float(res2.error),
        ok=True,
    )


def align_to_depth_match(
    mesh: Mesh,
    mask: np.ndarray,
    depth_map: np.ndarray,
    ref_crop_rgba: np.ndarray,
    elevation_deg: float,
    crop_params,
    K_img: np.ndarray,
    matcher: MatcherBackend,
    key=None,
    renderer: OrbitRenderer | None = None,
) -> np.ndarray:
    """`src/util.py:464-493` equivalent: returns the 4x4 scene-placement
    transform (identity on failure / empty overlap, as the reference)."""
    res = register_object(
        mesh, ref_crop_rgba, elevation_deg, crop_params, K_img,
        depth_map.shape, depth_map, mask, matcher, key, renderer=renderer,
    )
    return res.transform if res.ok else np.eye(4)
