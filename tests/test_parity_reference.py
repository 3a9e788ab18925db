"""Parity against the reference's ACTUAL code (not re-stated oracles).

Loads `/root/reference/src/{util_3dbox,util,cam_utils}.py` and
`matching/pose_estimator.py` via `tests/reference_loader.py` (cv2, sklearn,
scipy, torch are installed; trimesh/rembg/pycocotools/pytorch3d stubbed)
and scores our TPU programs against the reference's own outputs on
synthetic scenes:

  * `label_instances` vs `estimate_bbox` (src/util_3dbox.py:106-178):
    >= 0.95 mean 3D IoU, with and without ground alignment.
  * field-level `3dbbox.json` agreement: BoxStage's dicts vs dicts built
    exactly as `save_3d_with_ground_alignment_bbox` does
    (src/util_3dbox.py:282-289).
  * `depth_to_points` (src/util.py:52-76): exact.
  * `align_depth` (src/util.py:110-136): recovered affine map.
  * `crop_object` / `restore_mask_from_crop` (src/util.py:140-214).
  * `orbit_camera` / `look_at` (src/cam_utils.py:14-52): exact.
  * `PoseEstimator.estimate_pose_pnp` (src/matching/pose_estimator.py:11-64,
    cv2.solvePnPRansac): pose agreement on noisy correspondences.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labelany3d_tpu.export.iou3d import box3d_iou
from labelany3d_tpu.pipeline.labeling import label_instances
from tests.reference_loader import load_reference
from tests.test_parity_iou import _mean_iou, _scene

REF_U3D, REF_UTIL, REF_CAM, REF_POSE = load_reference()


def _ref_boxes(depth, masks, K, seed, ground_equ=None):
    """Per-object reference loop: depth_to_points + estimate_bbox, exactly
    as the reference's stage-7 box path composes them."""
    pts_map = REF_UTIL.depth_to_points(depth[None].astype(np.float32), K=K)
    corners, dicts = [], []
    np.random.seed(seed)  # estimate_bbox subsamples via the global RNG
    for i, m in enumerate(masks):
        verts, center, dims, r_cam = REF_U3D.estimate_bbox(
            pts_map[m].astype(np.float64), None, ground_equ, method="pca"
        )
        corners.append(verts)
        dicts.append(
            {  # src/util_3dbox.py:282-289 field set
                "obj_id": str(i),
                "category_name": "chair",
                "center_cam": np.asarray(center, np.float64).tolist(),
                "R_cam": np.asarray(r_cam, np.float64).tolist(),
                "dimensions": [float(d) for d in dims],
                "bbox3D_cam": np.asarray(verts, np.float64).tolist(),
            }
        )
    return np.stack(corners), dicts


def _scene_volumetric(rng, h=160, w=192, fx=150.0):
    """Depth scene whose 4 objects have REAL extent on all three axes
    (0.7-1.8 m depth ranges): the reference's 500-pt random subsample
    (src/util_3dbox.py:123-125) adds extent noise ~range/N, so thick
    objects keep its own self-IoU floor above the 0.95 target — thin
    objects are covered by `test_label_instances_vs_reference_noise_floor`
    at the reference's measured floor instead."""
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
    depth = np.full((h, w), 9.0, np.float32)
    masks = []

    def add_rect(x0, y0, x1, y1, zfn):
        m = np.zeros((h, w), bool)
        m[y0:y1, x0:x1] = True
        ys, xs = np.nonzero(m)
        depth[ys, xs] = zfn(xs, ys)
        masks.append(m)

    add_rect(20, 30, 70, 100, lambda xs, ys: 4.0 + (xs - 20) * 0.022 + (ys - 30) * 0.006)
    add_rect(90, 20, 150, 70, lambda xs, ys: 3.0 + (xs - 90) * 0.025 + (ys - 20) * 0.008)
    add_rect(30, 110, 100, 150, lambda xs, ys: 5.0 + (ys - 110) * 0.03 + (xs - 30) * 0.01)
    add_rect(120, 90, 180, 150, lambda xs, ys: 6.0 + (xs - 120) * 0.02 + (ys - 90) * 0.015)
    depth += rng.normal(0, 0.003, depth.shape).astype(np.float32)
    return depth, np.stack(masks), K


def _point_clouds(rng, n_obj=4, n_pts=450):
    """Anisotropic box-surface clouds of <500 points: `estimate_bbox` skips
    its random subsample below 500 (src/util_3dbox.py:123-125), so the
    reference is fully deterministic on these — the one regime where a hard
    >=0.95 agreement bound is meaningful rather than subsample luck."""
    clouds = []
    for _ in range(n_obj):
        dims = rng.uniform(0.4, 2.5, size=3)
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        # Points on the box surface (pick a face per point).
        u = rng.uniform(-0.5, 0.5, size=(n_pts, 3))
        face = rng.integers(0, 3, n_pts)
        sign = rng.choice([-0.5, 0.5], n_pts)
        u[np.arange(n_pts), face] = sign
        pc = (u * dims) @ R.T + rng.uniform(-1, 1, 3) + [0, 0, 6.0]
        clouds.append(pc)
    return clouds


def test_boxfit_vs_reference_exact_points():
    """Hard >=0.95 bound: identical point sets through our `fit_boxes_batch`
    and the reference's `estimate_bbox` (which is deterministic at <500
    points). This isolates the box-fit math (PCA yaw, extents, ground
    rotation, vertex layout) from subsample noise, which
    `test_label_instances_vs_reference_noise_floor` covers separately."""
    from labelany3d_tpu.geometry.boxfit import fit_boxes_batch

    rng = np.random.default_rng(11)
    clouds = _point_clouds(rng)
    S = 512
    pts = np.zeros((len(clouds), S, 3), np.float32)
    valid = np.zeros((len(clouds), S), bool)
    for i, pc in enumerate(clouds):
        pts[i, : len(pc)] = pc
        valid[i, : len(pc)] = True

    for ground in (None, np.array([0.1, -0.98, 0.05])):
        ref_corners = []
        for pc in clouds:
            verts, *_ = REF_U3D.estimate_bbox(
                pc, None, None if ground is None else ground.copy(), method="pca"
            )
            ref_corners.append(verts)
        ref_corners = np.stack(ref_corners)

        ups = None if ground is None else jnp.tile(
            jnp.asarray(ground / np.linalg.norm(ground), jnp.float32)[None],
            (len(clouds), 1),
        )
        boxes = fit_boxes_batch(jnp.asarray(pts), jnp.asarray(valid), ups,
                                method="pca")
        mean_iou = _mean_iou(np.asarray(boxes.vertices), ref_corners)
        assert mean_iou >= 0.95, (
            f"ours-vs-REFERENCE {mean_iou:.3f} (ground={ground is not None})"
        )


def test_label_instances_vs_reference_estimate_bbox():
    """Full pipeline program (sampler included) vs the reference on a
    volumetric depth scene: must sit at/above the reference's OWN
    draw-to-draw agreement."""
    rng = np.random.default_rng(0)
    depth, masks, K = _scene_volumetric(rng)

    ref_corners, _ = _ref_boxes(depth, masks, K, seed=0)
    # The reference's own 500-pt global-RNG subsample is its noise floor.
    ref_corners_b, _ = _ref_boxes(depth, masks, K, seed=7)
    self_iou = _mean_iou(ref_corners, ref_corners_b)

    out = label_instances(
        jnp.asarray(depth[None]), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(masks[None]), jax.random.PRNGKey(0),
        num_points=512, method="pca",
    )
    assert bool(np.asarray(out.boxes.ok[0]).all())
    mean_iou = _mean_iou(np.asarray(out.boxes.vertices[0]), ref_corners)
    assert mean_iou >= min(0.95, self_iou - 0.02) and mean_iou >= 0.90, (
        f"ours-vs-REFERENCE {mean_iou:.3f} (ref self-floor {self_iou:.3f})"
    )


def test_label_instances_vs_reference_noise_floor():
    """On the thin-object scene of `test_parity_iou._scene` the reference's
    own resample-to-resample IoU is ~0.93; ours must sit AT that floor —
    i.e. be as close to one reference draw as another reference draw is."""
    rng = np.random.default_rng(0)
    depth, masks, K = _scene(rng)

    ref_corners, _ = _ref_boxes(depth, masks, K, seed=0)
    ref_corners_b, _ = _ref_boxes(depth, masks, K, seed=7)
    self_iou = _mean_iou(ref_corners, ref_corners_b)

    out = label_instances(
        jnp.asarray(depth[None]), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(masks[None]), jax.random.PRNGKey(0),
        num_points=512, method="pca",
    )
    mean_iou = _mean_iou(np.asarray(out.boxes.vertices[0]), ref_corners)
    assert mean_iou >= self_iou - 0.02, (
        f"ours-vs-REFERENCE {mean_iou:.3f} below ref self-floor {self_iou:.3f}"
    )


def test_label_instances_vs_reference_ground_aligned():
    rng = np.random.default_rng(2)
    depth, masks, K = _scene_volumetric(rng)
    # Tilted canonical upright, as the mesh path supplies
    # (src/util_3dbox.py:128-133 sign-flips toward -y then rotates).
    up = np.array([0.08, -0.99, 0.12], np.float64)
    up /= np.linalg.norm(up)

    ref_corners, _ = _ref_boxes(depth, masks, K, seed=0, ground_equ=up.copy())
    ref_corners_b, _ = _ref_boxes(depth, masks, K, seed=7, ground_equ=up.copy())
    self_iou = _mean_iou(ref_corners, ref_corners_b)

    ups = jnp.tile(jnp.asarray(up, jnp.float32)[None, None], (1, len(masks), 1))
    out = label_instances(
        jnp.asarray(depth[None]), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(masks[None]), jax.random.PRNGKey(0),
        up_vectors=ups, num_points=512, method="pca",
    )
    mean_iou = _mean_iou(np.asarray(out.boxes.vertices[0]), ref_corners)
    assert mean_iou >= min(0.95, self_iou - 0.02) and mean_iou >= 0.88, (
        f"ground-aligned ours-vs-REFERENCE {mean_iou:.3f} (floor {self_iou:.3f})"
    )


def test_3dbbox_json_field_parity(tmp_path):
    """BoxStage's 3dbbox.json vs reference-produced dicts, field by field."""
    from labelany3d_tpu.data.rle import rle_encode
    from labelany3d_tpu.models.fakes import FakeScene
    from labelany3d_tpu.pipeline.config import PipelineConfig
    from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
    from labelany3d_tpu.pipeline.stages import BoxStage

    scene = FakeScene(width=192, height=160, fx=150.0, fy=150.0)
    img, depth, masks, _ = scene.make(
        [{"z": 4.0, "rect": (30, 40, 80, 110)}, {"z": 6.0, "rect": (110, 50, 170, 120)}]
    )
    K = scene.intrinsics()
    annos = []
    for m in masks:
        rle = rle_encode(m)
        ys, xs = np.nonzero(m)
        annos.append({
            "image_id": 1, "category_id": 62, "iscrowd": 0,
            "bbox": [float(xs.min()), float(ys.min()),
                     float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
            "segmentation": {"size": rle["size"], "counts": rle["counts"].decode()},
        })

    class _Loader:
        images = [{"id": 1, "file_name": "000000000009.jpg",
                   "height": 160, "width": 192}]

        def get_image_by_index(self, i):
            return self.images[i]

        def get_annotations(self, image_id):
            return annos

        def __len__(self):
            return 1

    save_dir = str(tmp_path)
    sd = SceneDir(os.path.join(save_dir, "val", scene_dir_name("000000000009.jpg"))).ensure()
    sd.write_depth(depth)
    sd.write_cam_params(K, np.eye(4), 192, 160)
    cfg = PipelineConfig(batch_size=1, max_instances=8, num_points=512,
                         image_height=160, image_width=192)
    BoxStage(cfg, _Loader(), save_dir, "val").run(0, 1)

    ours = json.loads(sd.bbox3d_path.read_text()) if hasattr(sd, "bbox3d_path") \
        else json.load(open(os.path.join(sd.root, "3dbbox.json")))
    _, ref_dicts = _ref_boxes(depth, masks, K, seed=0)

    assert len(ours) == len(ref_dicts)
    for o, r in zip(ours, ref_dicts):
        # Same field set as src/util_3dbox.py:282-289.
        assert set(o.keys()) == set(r.keys()), (o.keys(), r.keys())
        c_o, c_r = np.asarray(o["center_cam"]), np.asarray(r["center_cam"])
        assert np.abs(c_o - c_r).max() < 0.05, (c_o, c_r)
        d_o, d_r = np.asarray(o["dimensions"]), np.asarray(r["dimensions"])
        # Same [dz, dy, dx] ordering; subsample noise bounds the tolerance.
        assert np.abs(d_o - d_r).max() < 0.07 + 0.05 * d_r.max(), (d_o, d_r)
        assert np.asarray(o["R_cam"]).shape == (3, 3)
        iou = float(box3d_iou(jnp.asarray(np.asarray(o["bbox3D_cam"])),
                              jnp.asarray(np.asarray(r["bbox3D_cam"])), grid=48))
        assert iou >= 0.92, f"bbox3D_cam IoU {iou:.3f}"


def test_depth_to_points_matches_reference():
    from labelany3d_tpu.geometry.backproject import depth_to_points

    rng = np.random.default_rng(4)
    depth = rng.uniform(1.0, 8.0, size=(40, 56)).astype(np.float32)
    K = np.array([[150.0, 0, 28.0], [0, 140.0, 20.0], [0, 0, 1]], np.float64)
    ref = REF_UTIL.depth_to_points(depth[None], K=K)
    ours = np.asarray(depth_to_points(jnp.asarray(depth)[None],
                                      jnp.asarray(K, jnp.float32)[None]))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_align_depth_matches_reference():
    from labelany3d_tpu.geometry.align import align_depth_affine

    rng = np.random.default_rng(5)
    rel = rng.uniform(1.0, 5.0, size=(64, 80)).astype(np.float32)
    metric = (2.5 * rel + 0.7).astype(np.float32)
    metric += rng.normal(0, 0.01, metric.shape).astype(np.float32)
    out_idx = rng.uniform(size=metric.shape) < 0.08
    metric[out_idx] += rng.uniform(5, 30, int(out_idx.sum())).astype(np.float32)
    mask = np.zeros((64, 80), bool)
    mask[4:60, 6:74] = True

    ref = REF_UTIL.align_depth(rel, metric, mask=mask)
    ours = np.asarray(align_depth_affine(
        jnp.asarray(rel), jnp.asarray(metric), jnp.asarray(mask),
        jax.random.PRNGKey(0), intercept=True, max_valid_depth=None,
    ))
    # Outside the mask both use the 10000.0 sentinel.
    assert float(ref[~mask].min()) == 10000.0 and float(ours[~mask].min()) == 10000.0
    # Inside: both RANSACs must recover the same affine map (2.5x + 0.7).
    in_ref, in_ours = ref[mask], ours[mask]
    rel_err = np.abs(in_ours - in_ref) / np.maximum(np.abs(in_ref), 1e-6)
    assert float(np.median(rel_err)) < 0.01
    assert float(np.mean(rel_err < 0.05)) > 0.98


def test_crop_params_match_reference():
    from labelany3d_tpu.geometry.crops import crop_object_params

    rng = np.random.default_rng(6)
    image = rng.integers(0, 255, size=(160, 192, 3), dtype=np.uint8)
    mask = np.zeros((160, 192), bool)
    mask[37:121, 52:140] = True

    _, (ox, oy, sf) = REF_UTIL.crop_object(image, mask, crop_size=256)
    p = crop_object_params(jnp.asarray(mask), crop_size=256, ratio=0.7)
    assert float(p.offset_x) == pytest.approx(ox)
    assert float(p.offset_y) == pytest.approx(oy)
    assert float(p.scale) == pytest.approx(sf)


def test_restore_mask_matches_reference():
    from labelany3d_tpu.geometry.crops import crop_object_params, restore_mask_from_crop

    rng = np.random.default_rng(7)
    image = rng.integers(0, 255, size=(160, 192, 3), dtype=np.uint8)
    full = np.zeros((160, 192), bool)
    full[37:121, 52:140] = True
    crop, (ox, oy, sf) = REF_UTIL.crop_object(image, full, crop_size=256)
    # Crop-space mask = the crop's own alpha channel (as the completion
    # stage's segmented output is).
    crop_mask = np.asarray(crop)[..., -1] > 127

    ref = REF_UTIL.restore_mask_from_crop(crop_mask, ox, oy, sf, (160, 192))
    ours = np.asarray(restore_mask_from_crop(
        jnp.asarray(crop_mask), jnp.float32(ox), jnp.float32(oy),
        jnp.float32(sf), (160, 192),
    ))
    agree = float(np.mean(ref == ours))
    assert agree >= 0.999, f"restore agreement {agree:.4f}"
    inter = np.logical_and(ref, ours).sum()
    union = np.logical_or(ref, ours).sum()
    assert inter / max(union, 1) >= 0.99


def test_orbit_camera_matches_reference():
    from labelany3d_tpu.geometry.camera import look_at, orbit_camera

    for elev in (-60.0, -10.0, 0.0, 25.0, 70.0):
        for azim in (-150.0, -45.0, 0.0, 30.0, 120.0):
            for opengl in (True, False):
                ref = REF_CAM.orbit_camera(elev, azim, radius=2.3, opengl=opengl)
                ours = np.asarray(orbit_camera(elev, azim, radius=2.3, opengl=opengl))
                np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # Unbatched, as the reference's own orbit_camera consumes it: its
    # `np.stack(..., axis=1)` yields columns=(right,up,forward) for (3,)
    # inputs but rows for batched (N,3) inputs — we match the convention
    # it actually uses (src/cam_utils.py:30-31,52).
    campos = np.array([1.0, 2.0, 3.0], np.float32)
    target = np.array([0.2, -0.1, 0.4], np.float32)
    np.testing.assert_allclose(
        np.asarray(look_at(jnp.asarray(campos), jnp.asarray(target), opengl=True)),
        REF_CAM.look_at(campos, target, opengl=True), rtol=1e-5, atol=1e-5,
    )


def test_pnp_matches_reference_cv2():
    from labelany3d_tpu.geometry.pnp import solve_pnp_ransac

    import cv2

    rng = np.random.default_rng(8)
    n = 200
    obj = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    rvec_gt = np.array([0.2, -0.4, 0.1], np.float64)
    R_gt, _ = cv2.Rodrigues(rvec_gt)
    t_gt = np.array([0.15, -0.2, 4.0], np.float64)
    K = np.array([[420.0, 0, 256.0], [0, 420.0, 256.0], [0, 0, 1]], np.float64)
    cam_pts = obj @ R_gt.T + t_gt
    img = (cam_pts @ K.T)
    img = img[:, :2] / img[:, 2:3]
    img += rng.normal(0, 0.4, img.shape)  # pixel noise
    out_idx = rng.choice(n, size=n // 5, replace=False)
    img[out_idx] += rng.uniform(60, 200, size=(len(out_idx), 2))  # gross outliers
    img = img.astype(np.float32)

    pe = REF_POSE.PoseEstimator("cpu")
    ok, rvec, tvec, inliers, err, _ = pe.estimate_pose_pnp(obj, img, K, None)
    assert ok
    R_ref, _ = cv2.Rodrigues(rvec)

    res = solve_pnp_ransac(
        jnp.asarray(obj), jnp.asarray(img), jnp.asarray(K, jnp.float32),
        valid=jnp.ones((n,), bool), key=jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    R_ours = np.asarray(res.rotation, np.float64)
    t_ours = np.asarray(res.translation, np.float64)

    def rot_angle(Ra, Rb):
        c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
        return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))

    # Both must recover the ground-truth pose despite 20% outliers...
    assert rot_angle(R_ours, R_gt) < 1.0
    assert np.linalg.norm(t_ours - t_gt) < 0.05
    assert rot_angle(R_ref, R_gt) < 1.0
    # ...and therefore each other.
    assert rot_angle(R_ours, R_ref) < 1.5
    assert np.linalg.norm(t_ours - tvec.ravel()) < 0.08
