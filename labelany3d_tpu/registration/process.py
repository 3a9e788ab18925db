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
_PNP_STATICS = (
    "num_trials", "sample_size", "reproj_threshold",
    "refine_iterations", "min_inliers",
)
_pnp_jitted = jax.jit(solve_pnp_ransac, static_argnames=_PNP_STATICS)


def _pnp_batch(obj, img, K, valid, keys, *, num_trials=256, sample_size=6,
               reproj_threshold=20.0, refine_iterations=10, min_inliers=6):
    """Whole-image variant: one program solves every object's PnP (the
    per-object correspondence sets stack on a leading axis; K is shared)."""

    def one(o, i, v, k):
        return solve_pnp_ransac(
            o, i, K, v, k, num_trials=num_trials, sample_size=sample_size,
            reproj_threshold=reproj_threshold,
            refine_iterations=refine_iterations, min_inliers=min_inliers,
        )

    return jax.vmap(one)(obj, img, valid, keys)


_pnp_vmapped = jax.jit(_pnp_batch, static_argnames=_PNP_STATICS)
_median_scale_jitted = jax.jit(median_ratio_scale)
_median_scale_vmapped = jax.jit(
    jax.vmap(median_ratio_scale, in_axes=(None, 0, 0)))


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


@dataclass
class ObjectToRegister:
    """Per-object inputs for the whole-image registration batch."""

    mesh: Mesh
    ref_crop_rgba: np.ndarray
    elevation_deg: float
    crop_params: tuple[float, float, float]   # (offset_x, offset_y, scale)
    scene_mask: np.ndarray                    # full-image instance mask


def _failed(image_hw) -> RegistrationResult:
    return RegistrationResult(
        rotation=np.eye(3), translation=np.zeros(3), scale=1.0,
        transform=np.eye(4), render_depth=np.full(image_hw, -1.0),
        render_mask=np.zeros(image_hw, bool), num_inliers=0,
        error=float("inf"), ok=False,
    )


def _pad_stack(obj_pts, img_pts, valids):
    """Stack per-object correspondence sets on a leading axis, padding to
    the max count with valid=False rows. Production matchers return static
    counts (strided query grids), so the pad is a no-op there; it only
    fires for heterogeneous third-party backends."""
    m = max(a.shape[0] for a in obj_pts)

    def pad(a, fill=0.0):
        if a.shape[0] == m:
            return a
        width = ((0, m - a.shape[0]),) + ((0, 0),) * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    return (np.stack([pad(a) for a in obj_pts]),
            np.stack([pad(a) for a in img_pts]),
            np.stack([pad(v, False) for v in valids]))


def _match_pairs(matcher: MatcherBackend, refs, views, ref_index):
    """Dispatch to the fastest matcher capability available: one forward
    for ALL pairs (`match_pairs`), one per reference (`match_batch`), or
    one per pair (`match`)."""
    if hasattr(matcher, "match_pairs"):
        return matcher.match_pairs(refs, views, ref_index)
    out = [None] * len(views)
    if hasattr(matcher, "match_batch"):
        by_ref: dict[int, list[int]] = {}
        for p, r in enumerate(ref_index):
            by_ref.setdefault(r, []).append(p)
        for r, ps in by_ref.items():
            for p, m in zip(ps, matcher.match_batch(refs[r], [views[p] for p in ps])):
                out[p] = m
        return out
    return [matcher.match(refs[r], views[p]) for p, r in enumerate(ref_index)]


def register_objects(
    objects: list[ObjectToRegister],
    K_img: np.ndarray,
    image_hw: tuple[int, int],
    scene_depth: np.ndarray,
    matcher: MatcherBackend,
    key=None,
    renderer: OrbitRenderer | None = None,
    reproj_threshold: float = 20.0,
) -> list[RegistrationResult]:
    """Register ALL of an image's generated meshes in one batched pass.

    The reference registers objects one at a time — 8 sequential bs=1
    MASt3R forwards + a CPU PnP per object
    (`src/matching/process_image_space.py:34-159`; bs=1 was free on GPU).
    Here the whole image batches: ONE matcher forward over every object's
    8 orbit-view pairs (stage A), ONE vmapped hypothesis-batch PnP over
    objects, ONE matcher forward over the re-render pairs (stage B), a
    second vmapped PnP against the image intrinsics, and ONE vmapped
    median-ratio scale (stage C). Only the rasterizer renders per object
    (meshes have different vertex counts; each render is already a single
    vmapped 8-view program).
    """
    n = len(objects)
    if n == 0:
        return []
    if key is None:
        key = jax.random.PRNGKey(0)
    renderer = renderer or OrbitRenderer()
    image_hw = tuple(image_hw)
    azimuths = list(range(0, 360, 45))

    # Stage A: 8 orbit views per object at its stage-5 elevation
    # (process_image_space :47-50 — elevations = [-elev]*8).
    views_flat, ref_index = [], []
    for i, ob in enumerate(objects):
        views_flat.extend(
            renderer.render_orbit_views(ob.mesh, [-ob.elevation_deg] * 8, azimuths))
        ref_index.extend([i] * 8)
    refs = [ob.ref_crop_rgba for ob in objects]
    matches = _match_pairs(matcher, refs, views_flat, ref_index)

    obj_all, img_all, valid_all = [], [], []
    for i in range(n):
        o_pts, i_pts, vs = [], [], []
        for p in range(i * 8, i * 8 + 8):
            xy_ref, xy_view, valid = matches[p]
            world, valid = _lift_matches_to_object(
                views_flat[p], xy_view, valid, renderer.K)
            o_pts.append(world)
            i_pts.append(xy_ref.astype(np.float32))
            vs.append(valid)
        obj_all.append(np.concatenate(o_pts))
        img_all.append(np.concatenate(i_pts))
        valid_all.append(np.concatenate(vs))

    k1, k2 = jax.random.split(key)
    keys1 = jax.random.split(k1, n)
    keys2 = jax.random.split(k2, n)
    obj_s, img_s, valid_s = _pad_stack(obj_all, img_all, valid_all)
    res1 = _pnp_vmapped(
        jnp.asarray(obj_s), jnp.asarray(img_s),
        jnp.asarray(renderer.K), jnp.asarray(valid_s), keys1,
        reproj_threshold=reproj_threshold,
    )
    res1 = jax.tree_util.tree_map(np.asarray, res1)

    # Stage B: re-render each survivor at its estimated pose, re-match all
    # pairs in one forward, solve against the full-image intrinsics
    # (process_image_space :104-159).
    alive = [i for i in range(n) if bool(res1.ok[i])]
    results: list[RegistrationResult | None] = [
        None if i in alive else _failed(image_hw) for i in range(n)]
    if not alive:
        return results  # type: ignore[return-value]

    views1 = {i: renderer.render_pose(objects[i].mesh, res1.rotation[i],
                                      res1.translation[i])
              for i in alive}
    matches_b = _match_pairs(
        matcher, refs, [views1[i] for i in alive], list(alive))

    world_b, img_b, valid_b = [], [], []
    for j, i in enumerate(alive):
        xy_ref, xy_view, valid = matches_b[j]
        world, valid = _lift_matches_to_object(
            views1[i], xy_view, valid, renderer.K)
        ox, oy, scale_crop = objects[i].crop_params
        xy_img = xy_ref / scale_crop + np.array([[ox, oy]])  # crop -> image px
        world_b.append(world)
        img_b.append(xy_img.astype(np.float32))
        valid_b.append(valid)
    world_s, img_s2, valid_s2 = _pad_stack(world_b, img_b, valid_b)
    res2 = _pnp_vmapped(
        jnp.asarray(world_s), jnp.asarray(img_s2),
        jnp.asarray(K_img, jnp.float32),
        jnp.asarray(valid_s2), keys2[np.asarray(alive)],
        reproj_threshold=reproj_threshold,
    )
    res2 = jax.tree_util.tree_map(np.asarray, res2)

    # Stage C: full-image render per object + ONE vmapped median-ratio
    # metric scale (util.py:478-486).
    finals, poses = [], []
    for j, i in enumerate(alive):
        if bool(res2.ok[j]):
            R, t = res2.rotation[j], res2.translation[j]
            K_final = np.asarray(K_img, np.float32)
            inl, err = int(res2.inliers[j].sum()), float(res2.error[j])
        else:  # fall back to the stage-A pose under the render intrinsics
            R, t = res1.rotation[i], res1.translation[i]
            K_final = renderer.K
            inl, err = int(res1.inliers[i].sum()), float(res1.error[i])
        finals.append(renderer.render_pose(objects[i].mesh, R, t,
                                           image_size=image_hw, K=K_final))
        poses.append((R, t, inl, err))

    render_depths = np.stack([f.depth for f in finals])
    overlaps = np.stack([
        objects[i].scene_mask & (finals[j].depth > 0)
        for j, i in enumerate(alive)
    ])
    s_all, has_all = _median_scale_vmapped(
        jnp.asarray(scene_depth, jnp.float32), jnp.asarray(render_depths),
        jnp.asarray(overlaps),
    )
    s_all, has_all = np.asarray(s_all), np.asarray(has_all)

    for j, i in enumerate(alive):
        R, t, inl, err = poses[j]
        scale = float(s_all[j]) if bool(has_all[j]) else 1.0
        transform = np.eye(4)
        if bool(has_all[j]):
            transform[:3, :3] = R * scale
            transform[:3, 3] = t * scale
        results[i] = RegistrationResult(
            rotation=R, translation=t, scale=scale, transform=transform,
            render_depth=finals[j].depth, render_mask=finals[j].depth > 0,
            num_inliers=inl, error=err, ok=True,
        )
    return results  # type: ignore[return-value]


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
    """Register one generated mesh into the scene (the batch of one)."""
    return register_objects(
        [ObjectToRegister(mesh, ref_crop_rgba, elevation_deg, crop_params,
                          scene_mask)],
        K_img, image_hw, scene_depth, matcher, key,
        renderer=renderer, reproj_threshold=reproj_threshold,
    )[0]


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
