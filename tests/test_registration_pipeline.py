"""Registration subsystem test: recover a known object pose + scale.

A textured cube is placed in a synthetic scene at a known pose/scale; an
oracle matcher (geometry-derived correspondences, standing in for MASt3R)
drives the full register_object loop: orbit renders -> matches -> PnP ->
re-render -> PnP -> median-ratio scale. The recovered transform must equal
s * [R | t].
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.data.meshio import Mesh
from labelany3d_tpu.models.matcher import MatcherConfig, TwoViewMatcher, match_images
from labelany3d_tpu.registration import (
    OrbitRenderer,
    RenderedView,
    align_to_depth_match,
    opencv_orbit_pose,
    register_object,
)
from tests.oracles import rotate_y_np


def _textured_cube(n=6):
    """Cube subdivided into an n x n grid per face with noisy vertex colors
    (texture-like, so descriptor matching has structure)."""
    rng = np.random.default_rng(3)
    verts, faces, colors = [], [], []
    base = 0
    axes = [(0, 1, 2, 1), (0, 1, 2, -1), (1, 2, 0, 1), (1, 2, 0, -1), (2, 0, 1, 1), (2, 0, 1, -1)]
    for a, b, c, sign in axes:
        for i in range(n + 1):
            for j in range(n + 1):
                p = np.zeros(3)
                p[a] = i / n - 0.5
                p[b] = j / n - 0.5
                p[c] = 0.5 * sign
                verts.append(p)
                colors.append(rng.uniform(0, 1, 3))
        for i in range(n):
            for j in range(n):
                v0 = base + i * (n + 1) + j
                v1 = v0 + 1
                v2 = v0 + (n + 1)
                v3 = v2 + 1
                faces += [[v0, v1, v3], [v0, v3, v2]]
        base += (n + 1) ** 2
    return Mesh(
        vertices=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32),
        colors=np.asarray(colors, np.float32),
    )


class OracleMatcher:
    """Geometry-derived correspondences: unprojects the render's depth and
    projects into the scene camera via the ground-truth placement.

    Returns ref-side coordinates in *crop space* (the matcher contract —
    the real matcher sees the 512^2 crop), mapped from scene pixels via
    `crop_params` (identity by default)."""

    def __init__(self, K_img, transform_gt, scene_depth, num_samples=512,
                 crop_params=(0.0, 0.0, 1.0)):
        self.K_img = np.asarray(K_img, np.float64)
        self.T_gt = np.asarray(transform_gt, np.float64)  # object -> camera (scaled)
        self.h, self.w = scene_depth.shape
        self.num = num_samples
        self.crop_params = crop_params

    def match(self, ref_rgba, view: RenderedView):
        ys, xs = np.nonzero(view.depth > 0)
        if len(ys) == 0:
            z = np.zeros((self.num, 2), np.float32)
            return z, z, np.zeros(self.num, bool)
        sel = np.linspace(0, len(ys) - 1, self.num).astype(int)
        yv, xv = ys[sel], xs[sel]
        d = view.depth[yv, xv]
        from labelany3d_tpu.registration.cameras import RENDER_K

        Kinv = np.linalg.inv(RENDER_K.astype(np.float64))
        cam = np.stack([xv * d, yv * d, d], -1) @ Kinv.T
        obj = (cam - view.t) @ view.R  # object space
        # ground-truth projection into the scene camera
        cam_scene = obj @ self.T_gt[:3, :3].T + self.T_gt[:3, 3]
        uv = cam_scene @ self.K_img.T
        uv = uv[:, :2] / uv[:, 2:3]
        valid = (
            (cam_scene[:, 2] > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < self.w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < self.h)
        )
        xy_view = np.stack([xv, yv], -1).astype(np.float32)
        ox, oy, sc = self.crop_params
        uv_crop = (uv - np.array([[ox, oy]])) * sc
        return uv_crop.astype(np.float32), xy_view, valid


@pytest.fixture(scope="module")
def registration_world():
    mesh = _textured_cube()
    K_img = np.array([[400.0, 0, 128.0], [0, 400.0, 128.0], [0, 0, 1]], np.float32)
    image_hw = (256, 256)
    s_gt = 2.0
    R_gt = rotate_y_np(0.4).astype(np.float32)
    t_gt = np.array([0.1, -0.05, 3.0], np.float32)
    T_gt = np.eye(4)
    T_gt[:3, :3] = s_gt * R_gt
    T_gt[:3, 3] = s_gt * t_gt

    renderer = OrbitRenderer(faces_per_tile=256)
    scene_mesh = Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors)
    scene_mesh.apply_transform(T_gt)
    scene_view = renderer.render_pose(
        scene_mesh, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        image_size=image_hw, K=K_img,
    )
    scene_depth = scene_view.depth.copy()
    scene_mask = scene_depth > 0
    return mesh, K_img, image_hw, R_gt, t_gt, s_gt, T_gt, scene_depth, scene_mask, renderer


def test_opencv_orbit_pose_geometry():
    R, t = opencv_orbit_pose(0.0, 0.0, radius=2.0)
    campos = -R.T @ t
    np.testing.assert_allclose(campos, [0, 0, 2.0], atol=1e-6)
    # origin maps to (0, 0, radius) in camera coords (z forward)
    np.testing.assert_allclose(R @ np.zeros(3) + t, [0, 0, 2.0], atol=1e-6)
    # world +y is camera 'up' -> negative y (camera y is down)
    up_cam = R @ np.array([0.0, 1.0, 0.0])
    assert up_cam[1] < -0.9


@pytest.mark.heavy
def test_register_object_recovers_pose(registration_world):
    (mesh, K_img, image_hw, R_gt, t_gt, s_gt, T_gt,
     scene_depth, scene_mask, renderer) = registration_world
    matcher = OracleMatcher(K_img, T_gt, scene_depth)
    # ref crop == full image: crop_params identity
    ref_rgba = np.zeros(image_hw + (4,), np.float32)
    res = register_object(
        mesh, ref_rgba, elevation_deg=0.0, crop_params=(0.0, 0.0, 1.0),
        K_img=K_img, image_hw=image_hw, scene_depth=scene_depth,
        scene_mask=scene_mask, matcher=matcher, key=jax.random.PRNGKey(0),
        renderer=renderer,
    )
    assert res.ok
    np.testing.assert_allclose(res.rotation, R_gt, atol=0.05)
    np.testing.assert_allclose(res.translation, t_gt, atol=0.08)
    assert res.scale == pytest.approx(s_gt, abs=0.1)
    np.testing.assert_allclose(res.transform[:3, :3], s_gt * R_gt, atol=0.15)
    np.testing.assert_allclose(res.transform[:3, 3], s_gt * t_gt, atol=0.25)


@pytest.mark.heavy
def test_align_to_depth_match_identity_on_failure(registration_world):
    (mesh, K_img, image_hw, *_rest, renderer) = registration_world

    class NoMatcher:
        def match(self, ref, view):
            z = np.zeros((64, 2), np.float32)
            return z, z, np.zeros(64, bool)

    out = align_to_depth_match(
        mesh, np.zeros(image_hw, bool), np.full(image_hw, 5.0),
        np.zeros(image_hw + (4,), np.float32), 0.0, (0, 0, 1.0), K_img,
        NoMatcher(),
    )
    np.testing.assert_allclose(out, np.eye(4))


def test_two_view_matcher_model_shapes():
    cfg = MatcherConfig.tiny_test()
    model = TwoViewMatcher(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)["params"]
    out = model.apply({"params": params}, img, img)
    assert out["pts3d0"].shape == (1, 32, 32, 3)
    assert out["desc0"].shape == (1, 32, 32, cfg.desc_dim)
    norms = np.linalg.norm(np.asarray(out["desc0"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    res = match_images(model, params, img[0], img[0])
    assert res.xy0.shape[1] == 2


def test_jax_matcher_batch_matches_sequential():
    """match_batch (one batched forward over the orbit) must agree exactly
    with per-view match() calls — same model, same descriptors."""
    from labelany3d_tpu.pipeline.backends import JaxMatcherBackend
    from labelany3d_tpu.registration.renderer import RenderedView

    rng = np.random.default_rng(0)
    h = w = 64
    backend = JaxMatcherBackend(tiny=True, image_size=h)
    ref = rng.uniform(size=(h, w, 4)).astype(np.float32)
    views = [
        RenderedView(
            rgba=rng.uniform(size=(h, w, 4)).astype(np.float32),
            depth=np.full((h, w), 2.0, np.float32),
            R=np.eye(3, dtype=np.float32),
            t=np.zeros(3, np.float32),
        )
        for _ in range(3)
    ]
    batched = backend.match_batch(ref, views)
    assert len(batched) == 3
    for view, (bxy0, bxy1, bvalid) in zip(views, batched):
        xy0, xy1, valid = backend.match(ref, view)
        np.testing.assert_array_equal(bxy0, xy0)
        np.testing.assert_array_equal(bxy1, xy1)
        np.testing.assert_array_equal(bvalid, valid)
    assert backend.match_batch(ref, []) == []


class MultiOracleMatcher:
    """Per-object oracle matchers behind the `match_pairs` capability:
    pair p consults the oracle of ref_index[p] (exercises the whole-image
    batched dispatch in `register_objects`)."""

    def __init__(self, oracles):
        self.oracles = oracles

    def match_pairs(self, refs, views, ref_index):
        return [self.oracles[r].match(refs[r], views[p])
                for p, r in enumerate(ref_index)]


@pytest.fixture(scope="module")
def two_object_world():
    mesh = _textured_cube()
    K_img = np.array([[400.0, 0, 128.0], [0, 400.0, 128.0], [0, 0, 1]], np.float32)
    image_hw = (256, 256)
    gts = []
    for s_gt, yaw, t_gt in (
        (2.0, 0.4, np.array([-0.9, -0.05, 3.2], np.float32)),
        (1.5, -0.7, np.array([1.0, 0.1, 4.0], np.float32)),
    ):
        R_gt = rotate_y_np(yaw).astype(np.float32)
        T = np.eye(4)
        T[:3, :3] = s_gt * R_gt
        T[:3, 3] = s_gt * t_gt
        gts.append((s_gt, R_gt, t_gt, T))

    renderer = OrbitRenderer(faces_per_tile=256)
    depths, masks = [], []
    for _, _, _, T in gts:
        m = Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors)
        m.apply_transform(T)
        view = renderer.render_pose(
            m, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            image_size=image_hw, K=K_img,
        )
        depths.append(view.depth.copy())
        masks.append(view.depth > 0)
    # composite scene depth: nearest surface wins where both project
    scene_depth = np.where(
        masks[0] & (~masks[1] | (depths[0] <= np.where(masks[1], depths[1], np.inf))),
        depths[0], np.where(masks[1], depths[1], 0.0),
    ).astype(np.float32)
    return mesh, K_img, image_hw, gts, scene_depth, masks, renderer


@pytest.mark.heavy
def test_register_objects_batch_recovers_both_poses(two_object_world):
    """Whole-image batched registration (one matcher dispatch set + vmapped
    PnP/scale) recovers every object's pose, scale, and transform."""
    from labelany3d_tpu.registration.process import ObjectToRegister, register_objects

    mesh, K_img, image_hw, gts, scene_depth, masks, renderer = two_object_world
    oracles = [OracleMatcher(K_img, T, scene_depth) for *_x, T in gts]
    ref_rgba = np.zeros(image_hw + (4,), np.float32)
    objs = [
        ObjectToRegister(
            mesh=Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors),
            ref_crop_rgba=ref_rgba, elevation_deg=0.0,
            crop_params=(0.0, 0.0, 1.0), scene_mask=masks[i],
        )
        for i in range(2)
    ]
    results = register_objects(
        objs, K_img, image_hw, scene_depth, MultiOracleMatcher(oracles),
        key=jax.random.PRNGKey(0), renderer=renderer,
    )
    assert len(results) == 2
    for res, (s_gt, R_gt, t_gt, _T) in zip(results, gts):
        assert res.ok
        np.testing.assert_allclose(res.rotation, R_gt, atol=0.05)
        np.testing.assert_allclose(res.translation, t_gt, atol=0.08)
        assert res.scale == pytest.approx(s_gt, abs=0.12)
        np.testing.assert_allclose(res.transform[:3, :3], s_gt * R_gt, atol=0.15)
        np.testing.assert_allclose(res.transform[:3, 3], s_gt * t_gt, atol=0.3)


@pytest.mark.heavy
def test_register_objects_isolates_failures(two_object_world):
    """A matchless object reports ok=False without poisoning its neighbors
    (the vmapped solves keep static shapes; failures resolve on host)."""
    from labelany3d_tpu.registration.process import ObjectToRegister, register_objects

    mesh, K_img, image_hw, gts, scene_depth, masks, renderer = two_object_world

    class _Dead:
        def match(self, ref, view):
            z = np.zeros((64, 2), np.float32)
            return z, z, np.zeros(64, bool)

    oracles = [OracleMatcher(K_img, gts[0][3], scene_depth), _Dead()]
    ref_rgba = np.zeros(image_hw + (4,), np.float32)
    objs = [
        ObjectToRegister(
            mesh=Mesh(mesh.vertices.copy(), mesh.faces, mesh.colors),
            ref_crop_rgba=ref_rgba, elevation_deg=0.0,
            crop_params=(0.0, 0.0, 1.0), scene_mask=masks[i],
        )
        for i in range(2)
    ]
    results = register_objects(
        objs, K_img, image_hw, scene_depth, MultiOracleMatcher(oracles),
        key=jax.random.PRNGKey(0), renderer=renderer,
    )
    assert results[0].ok and not results[1].ok
    s_gt, R_gt, t_gt, _ = gts[0]
    np.testing.assert_allclose(results[0].rotation, R_gt, atol=0.05)
    np.testing.assert_allclose(results[1].transform, np.eye(4))


def test_jax_matcher_pairs_matches_sequential():
    """match_pairs (one forward over all refs x views with ref_index
    gather + count bucketing) must agree exactly with per-pair match()."""
    from labelany3d_tpu.pipeline.backends import JaxMatcherBackend
    from labelany3d_tpu.registration.renderer import RenderedView

    rng = np.random.default_rng(1)
    h = w = 64
    backend = JaxMatcherBackend(tiny=True, image_size=h)
    refs = [rng.uniform(size=(h, w, 4)).astype(np.float32) for _ in range(3)]
    views = [
        RenderedView(
            rgba=rng.uniform(size=(h, w, 4)).astype(np.float32),
            depth=np.full((h, w), 2.0, np.float32),
            R=np.eye(3, dtype=np.float32),
            t=np.zeros(3, np.float32),
        )
        for _ in range(6)
    ]
    ref_index = [0, 0, 1, 1, 2, 2]
    paired = backend.match_pairs(refs, views, ref_index)
    assert len(paired) == 6
    for p, (r, view) in enumerate(zip(ref_index, views)):
        xy0, xy1, valid = backend.match(refs[r], view)
        np.testing.assert_array_equal(paired[p][0], xy0)
        np.testing.assert_array_equal(paired[p][1], xy1)
        np.testing.assert_array_equal(paired[p][2], valid)
    assert backend.match_pairs(refs, [], []) == []
