"""Composed stage-7 parity against the reference's ACTUAL modules.

VERDICT r4 missing #4: the register -> align_to_depth_match -> convention
flip -> canonical upright -> ground box CHAIN was only scored leaf-by-leaf;
the documented convention difference (`registration/process.py:16-20`:
reference `transform[:3,:3] = inv(R_p3d) * s` for PyTorch3D row-convention
rotations vs our `s * [R | t]` OpenCV column-convention) was asserted in a
docstring, not a test.

This test closes the loop with the reference IN the loop:

  * our `register_object` recovers (R, t, s) for a known placement with an
    oracle matcher (MASt3R stand-in), rendering through OUR rasterizer;
  * the reference's ACTUAL `util.align_to_depth_match` (util.py:464-493)
    runs with its `process_object` stubbed to return the SAME pose in
    PyTorch3D convention (R_p3d = R^T, T_p3d = t) and OUR full-image render
    (the "reference renderer faked with our rasterizer's output" setup) —
    so its median-ratio scale and transform math execute as-is;
  * both transforms must be EQUAL (proving the convention note is an
    equivalence, not a divergence);
  * both placements compose per whole.py:109-122 (transform -> camera pose
    -> diag(-1,-1,1) flip; canonical upright = (convention @ transform)
    column 1) and the reference's `estimate_bbox` (util_3dbox.py:106-178)
    fits the ground-aligned box on the SAME 500-point sample our
    `fit_boxes_batch` sees: >= 0.95 3D IoU and matching upright.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from labelany3d_tpu.export.iou3d import box3d_iou
from labelany3d_tpu.geometry.boxfit import fit_boxes_batch
from labelany3d_tpu.pipeline.stages.layout import CONVENTION_FLIP
from labelany3d_tpu.registration import OrbitRenderer, register_object
from tests.reference_loader import load_reference
from tests.test_registration_pipeline import OracleMatcher, _textured_cube
from tests.oracles import rotate_y_np

REF_U3D, REF_UTIL, REF_CAM, REF_POSE = load_reference()


@pytest.fixture(scope="module")
def registered_world():
    mesh = _textured_cube()
    K_img = np.array([[400.0, 0, 128.0], [0, 400.0, 128.0], [0, 0, 1]], np.float32)
    image_hw = (256, 256)
    s_gt = 1.6
    R_gt = rotate_y_np(0.5).astype(np.float32)
    t_gt = np.array([0.15, -0.1, 3.2], np.float32)
    T_gt = np.eye(4)
    T_gt[:3, :3] = s_gt * R_gt
    T_gt[:3, 3] = s_gt * t_gt

    renderer = OrbitRenderer(faces_per_tile=256)
    from labelany3d_tpu.data.meshio import Mesh

    scene_mesh = Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors)
    scene_mesh.apply_transform(T_gt)
    scene_view = renderer.render_pose(
        scene_mesh, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        image_size=image_hw, K=K_img,
    )
    scene_depth = scene_view.depth.copy()
    scene_mask = scene_depth > 0

    matcher = OracleMatcher(K_img, T_gt, scene_depth)
    ref_rgba = np.zeros(image_hw + (4,), np.float32)
    res = register_object(
        mesh, ref_rgba, elevation_deg=0.0, crop_params=(0.0, 0.0, 1.0),
        K_img=K_img, image_hw=image_hw, scene_depth=scene_depth,
        scene_mask=scene_mask, matcher=matcher, key=jax.random.PRNGKey(1),
        renderer=renderer,
    )
    assert res.ok
    # A generic non-identity camera pose for the composition step.
    pose = np.eye(4)
    pose[:3, :3] = rotate_y_np(0.15)
    pose[:3, 3] = [0.3, 0.1, -0.4]
    return mesh, res, scene_depth, scene_mask, pose


def _reference_transform(res, scene_depth, scene_mask):
    """Run the reference's ACTUAL align_to_depth_match with process_object
    stubbed to OUR registration pose (converted to PyTorch3D row convention)
    and OUR rasterizer's full-image render (depth + alpha)."""
    R_p3d = np.eye(4)
    R_p3d[:3, :3] = res.rotation.T         # row-convention rotation
    T_p3d = res.translation.astype(np.float64)
    h, w = scene_depth.shape
    image_render = np.zeros((h, w, 4), np.float32)
    image_render[..., 3] = res.render_mask.astype(np.float32)

    mod = types.ModuleType("matching.process_image_space")
    mod.process_object = lambda obj, root, model: (
        R_p3d, T_p3d, image_render, res.render_depth)
    pkg = types.ModuleType("matching")
    pkg.process_image_space = mod
    old = {k: sys.modules.get(k) for k in ("matching", "matching.process_image_space")}
    sys.modules["matching"] = pkg
    sys.modules["matching.process_image_space"] = mod
    try:
        return np.asarray(REF_UTIL.align_to_depth_match(
            scene_mask, scene_depth, "0_chair", "/nonexistent", None))
    finally:
        for k, v in old.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_transform_conventions_equivalent(registered_world):
    """inv(R_p3d)*s == s*R (ours): the documented convention note, proved
    against the reference's own code path (util.py:489-492) running on our
    rasterizer's render."""
    mesh, res, scene_depth, scene_mask, pose = registered_world
    t_ref = _reference_transform(res, scene_depth, scene_mask)
    np.testing.assert_allclose(t_ref, res.transform, rtol=1e-4, atol=1e-5)


def test_stage7_composition_matches_reference(registered_world):
    mesh, res, scene_depth, scene_mask, pose = registered_world
    t_ref = _reference_transform(res, scene_depth, scene_mask)

    # Reference composition (whole.py:109-122): apply transform, then the
    # camera pose, then the convention flip; upright from the pre-pose
    # product.
    M_ref = CONVENTION_FLIP @ pose @ t_ref
    upright_ref = (CONVENTION_FLIP @ t_ref)[:, 1]

    # Our LayoutStage placement (pipeline/stages/layout.py:153-163).
    M_ours = CONVENTION_FLIP @ pose @ res.transform
    upright_ours = (CONVENTION_FLIP @ res.transform)[:, 1]
    np.testing.assert_allclose(M_ours, M_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(upright_ours, upright_ref, rtol=1e-4, atol=1e-5)

    # Ground-aligned box on the SAME placed 500-point sample: the
    # reference's estimate_bbox (ground normal = canonical upright,
    # util_3dbox.py:257-259) vs our batched fit.
    from labelany3d_tpu.data.meshio import Mesh

    placed = Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors)
    placed.apply_transform(M_ref)
    pts = placed.sample(500, seed=0)

    np.random.seed(0)
    verts_ref, center_ref, dims_ref, rcam_ref = REF_U3D.estimate_bbox(
        pts.astype(np.float64), "chair", upright_ref[:3], method="pca")

    boxes = jax.jit(fit_boxes_batch, static_argnames=("method",))(
        jnp.asarray(pts[None], jnp.float32),
        jnp.ones((1, 500), bool),
        jnp.asarray(upright_ours[None, :3], jnp.float32),
        method="pca",
    )
    assert bool(boxes.ok[0])
    iou = box3d_iou(np.asarray(boxes.vertices[0], np.float64),
                    np.asarray(verts_ref, np.float64))
    assert iou >= 0.95
    np.testing.assert_allclose(
        np.asarray(boxes.center_cam[0]), np.asarray(center_ref), atol=0.05)
