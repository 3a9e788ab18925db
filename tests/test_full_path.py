"""Full 8-stage pipeline test (generative path with geometric baselines).

One synthetic scene, one object. Stage 6's silhouette-extrusion baseline
reconstructs the object; an oracle matcher (ground-truth placement known
analytically from the scene geometry) drives stage 7's registration; the
exported box must land on the object's true center.
"""

import json

import numpy as np
import pytest

from labelany3d_tpu.data.meshio import load_glb
from labelany3d_tpu.data.rle import rle_encode
from labelany3d_tpu.models.fakes import FakeScene
from labelany3d_tpu.pipeline.backends import FakeDepthBackend
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages import (
    BicubicEnhance,
    CompletionStage,
    CropStage,
    DepthStage,
    ElevationStage,
    EnhanceStage,
    ExportStage,
    LayoutStage,
    ReconstructionStage,
)
from tests.test_registration_pipeline import OracleMatcher


class _ToyLoader:
    def __init__(self, images, annos_by_id):
        self.images = images
        self.annos = annos_by_id

    def get_image_by_index(self, i):
        return self.images[i]

    def get_annotations(self, image_id):
        return self.annos.get(image_id, [])

    def __len__(self):
        return len(self.images)


class _ArraySource:
    def __init__(self, images_by_id):
        self.images_by_id = images_by_id

    def get(self, info):
        return self.images_by_id[info["id"]]


@pytest.mark.slow
def test_full_generative_path(tmp_path):
    scene_gen = FakeScene(width=192, height=160, fx=150.0, fy=150.0)
    rect = (60, 40, 130, 120)
    z_obj = 4.0
    img, depth, masks, gts = scene_gen.make([{"z": z_obj, "rect": rect}])
    gt = gts[0]

    rle = rle_encode(masks[0])
    ys, xs = np.nonzero(masks[0])
    annos = [{
        "image_id": 1, "category_id": 62, "iscrowd": 0,
        "bbox": [float(xs.min()), float(ys.min()),
                 float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
        "segmentation": {"size": rle["size"], "counts": rle["counts"].decode()},
    }]
    images = [{"id": 1, "file_name": "000000000007.jpg",
               "height": scene_gen.height, "width": scene_gen.width}]
    loader = _ToyLoader(images, {1: annos})
    source = _ArraySource({1: img})
    save_dir = str(tmp_path / "results")
    cfg = PipelineConfig(batch_size=1, max_instances=4, num_points=512,
                         image_height=scene_gen.height, image_width=scene_gen.width)

    # Stages 1-6.
    assert DepthStage(cfg, FakeDepthBackend(depth[None], scene_gen.intrinsics()),
                      loader, source, save_dir, "val").run(0, 1) == 1
    assert EnhanceStage(cfg, loader, source, save_dir, "val",
                        backend=BicubicEnhance()).run(0, 1) == 1
    # Crops read the enhanced image at 4x with /4 coordinate bookkeeping.
    from labelany3d_tpu.pipeline.stages import CropStage as _CS

    assert _CS(cfg, loader, source, save_dir, "val").run(0, 1) == 1
    assert CompletionStage(cfg, loader, save_dir, "val").run(0, 1) == 1
    assert ElevationStage(cfg, loader, save_dir, "val").run(0, 1) == 1
    from labelany3d_tpu.pipeline.stages import SilhouetteExtrude
    assert ReconstructionStage(cfg, loader, save_dir, "val",
                               backend=SilhouetteExtrude(depth_ratio=0.02)).run(0, 1) == 1
    # thin extrusion: the visible surface approximates the fronto-parallel
    # object plane, so the median-ratio scale is unbiased in this synthetic

    sd = SceneDir(f"{save_dir}/val/{scene_dir_name('000000000007.jpg')}")
    crop_ids = sd.list_crop_ids()
    assert len(crop_ids) == 1
    obj_id = crop_ids[0]
    assert sd.object_mesh(obj_id).exists()
    mesh = load_glb(sd.object_mesh(obj_id))
    assert not mesh.is_empty

    # Ground-truth placement of the reconstructed prism: its silhouette
    # x-extent must map onto the object's metric x-extent at depth z_obj,
    # fronto-parallel, centered on the object's 3D center.
    vmin = mesh.vertices.min(axis=0)
    vmax = mesh.vertices.max(axis=0)
    s_gt = gt["extent_x"] / (vmax[0] - vmin[0])
    center = gt["center"]
    T_gt = np.eye(4)
    # object +y is up; camera y is down -> flip x/y like the reference's
    # convention handling; for a fronto-parallel symmetric prism a y-flip
    # rotation about x is the placing rotation.
    R_place = np.diag([1.0, -1.0, -1.0])
    T_gt[:3, :3] = s_gt * R_place
    T_gt[:3, 3] = center

    cp = np.load(sd.crop_params(obj_id))
    matcher = OracleMatcher(
        scene_gen.intrinsics(), T_gt, depth,
        crop_params=(float(cp[0]), float(cp[1]), float(cp[2])),
    )
    n = LayoutStage(cfg, loader, save_dir, "val", matcher=matcher).run(0, 1)
    assert n == 1
    bbox_list = json.loads(sd.bbox3d.read_text())
    assert len(bbox_list) == 1
    box = bbox_list[0]
    # The exported box center sits near the object's true center. The
    # convention flip (diag(-1,-1,1)) negates x/y, matching the reference's
    # exported frame.
    center_flipped = np.array([-center[0], -center[1], center[2]])
    np.testing.assert_allclose(box["center_cam"], center_flipped, atol=0.5)
    dims = np.sort(box["dimensions"])
    # x/y extents within 30% of truth (median-scale bias from prism depth).
    assert dims[2] == pytest.approx(max(gt["extent_x"], gt["extent_y"]), rel=0.35)

    out = ExportStage(save_dir, "val").run()
    assert len(out["images"]) == 1 and len(out["annotations"]) == 1
    assert (sd.root / "vis_3dbox.png").exists()
    assert (sd.root / "reconstruction" / "full_scene.glb").exists()


def _one_object_fixture(tmp_path, file_name="000000000007.jpg"):
    scene_gen = FakeScene(width=192, height=160, fx=150.0, fy=150.0)
    rect = (60, 40, 130, 120)
    img, depth, masks, gts = scene_gen.make([{"z": 4.0, "rect": rect}])
    rle = rle_encode(masks[0])
    ys, xs = np.nonzero(masks[0])
    annos = [{
        "image_id": 1, "category_id": 62, "iscrowd": 0,
        "bbox": [float(xs.min()), float(ys.min()),
                 float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
        "segmentation": {"size": rle["size"], "counts": rle["counts"].decode()},
    }]
    images = [{"id": 1, "file_name": file_name,
               "height": scene_gen.height, "width": scene_gen.width}]
    loader = _ToyLoader(images, {1: annos})
    source = _ArraySource({1: img})
    cfg = PipelineConfig(batch_size=1, max_instances=4, num_points=512,
                         image_height=scene_gen.height,
                         image_width=scene_gen.width)
    return scene_gen, img, depth, gts[0], loader, source, cfg


def _run_through_crops(cfg, loader, source, save_dir, scene_gen, depth):
    assert DepthStage(cfg, FakeDepthBackend(depth[None], scene_gen.intrinsics()),
                      loader, source, save_dir, "val").run(0, 1) == 1
    assert EnhanceStage(cfg, loader, source, save_dir, "val",
                        backend=BicubicEnhance()).run(0, 1) == 1
    assert CropStage(cfg, loader, source, save_dir, "val").run(0, 1) == 1
    assert CompletionStage(cfg, loader, save_dir, "val").run(0, 1) == 1
    assert ElevationStage(cfg, loader, save_dir, "val").run(0, 1) == 1


@pytest.mark.slow
def test_reconstruction_stage_with_trellis_backend(tmp_path):
    """Stage 6 with the REAL TrellisPipeline (tiny config): textured-GLB
    write -> load_glb round trip -> layout registration -> export. Random
    weights, so geometry is meaningless; the mesh head's bias is patched so
    the FlexiCubes field has guaranteed zero crossings (non-empty mesh) and
    the full generative plumbing is exercised end to end."""
    import numpy as _np

    from labelany3d_tpu.models.trellis import TrellisPipeline, TrellisPipelineConfig

    scene_gen, img, depth, gt, loader, source, cfg = _one_object_fixture(tmp_path)
    save_dir = str(tmp_path / "results")
    _run_through_crops(cfg, loader, source, save_dir, scene_gen, depth)

    pipe = TrellisPipeline(TrellisPipelineConfig.tiny_test())
    pipe.init_params()
    # Alternate +-0.5 corner-sdf biases -> sign changes in every active
    # cell -> non-empty extraction regardless of the random torso.
    bias = _np.array(pipe.params["mesh"]["out_layer"]["bias"])
    bias[0:8] = _np.where(_np.arange(8) % 2 == 0, 0.5, -0.5)
    pipe.params["mesh"]["out_layer"]["bias"] = bias

    assert ReconstructionStage(cfg, loader, save_dir, "val",
                               backend=pipe).run(0, 1) == 1
    sd = SceneDir(f"{save_dir}/val/{scene_dir_name('000000000007.jpg')}")
    obj_id = sd.list_crop_ids()[0]
    mesh = load_glb(sd.object_mesh(obj_id))
    assert not mesh.is_empty
    assert np.isfinite(mesh.vertices).all()
    # Textured bake round-trips through the GLB loader as colors.
    assert mesh.colors is not None and len(mesh.colors) == len(mesh.vertices)

    cp = np.load(sd.crop_params(obj_id))
    vmin, vmax = mesh.vertices.min(0), mesh.vertices.max(0)
    T_gt = np.eye(4)
    T_gt[:3, :3] = (gt["extent_x"] / max(vmax[0] - vmin[0], 1e-3)) * np.diag([1.0, -1.0, -1.0])
    T_gt[:3, 3] = gt["center"]
    matcher = OracleMatcher(scene_gen.intrinsics(), T_gt, depth,
                            crop_params=(float(cp[0]), float(cp[1]), float(cp[2])))
    assert LayoutStage(cfg, loader, save_dir, "val", matcher=matcher).run(0, 1) == 1
    bbox_list = json.loads(sd.bbox3d.read_text())
    assert len(bbox_list) == 1
    assert np.isfinite(np.asarray(bbox_list[0]["center_cam"])).all()
    out = ExportStage(save_dir, "val").run()
    assert len(out["annotations"]) == 1


@pytest.mark.slow
def test_reconstruction_stage_with_hunyuan3d_backend(tmp_path):
    """Stage 6 with the REAL SVRMReconstruction (tiny, mvd_std 7-view
    layout), field handcrafted to a known cylinder so the mesh is
    deterministic; plumbing through layout + export."""
    import jax as _jax
    import jax.numpy as _jnp

    from labelany3d_tpu.models.svrm import SVRM, SVRMConfig, SVRMReconstruction

    scene_gen, img, depth, gt, loader, source, cfg = _one_object_fixture(tmp_path)
    save_dir = str(tmp_path / "results")
    _run_through_crops(cfg, loader, source, save_dir, scene_gen, depth)

    scfg = SVRMConfig.tiny_test()
    model = SVRM(scfg)
    views = _jnp.zeros((1, scfg.num_views, scfg.image_size, scfg.image_size, 3))
    cams = _jnp.zeros((1, scfg.num_views, scfg.cam_dim))
    params = model.init(_jax.random.PRNGKey(0), views, cams,
                        method=SVRM.init_all)["params"]
    # field -> sdf = plane0(x, y) - shift (cylinder; see test_svrm).
    import numpy as _np

    fp = _jax.tree.map(_np.array, params["field"])
    fp["fc0"]["kernel"][:] = 0
    fp["fc0"]["bias"][:] = 0
    fp["fc0"]["kernel"][0, 0] = 1.0
    fp["fc0"]["kernel"][0, 1] = -1.0
    fp["out"]["kernel"][:] = 0
    fp["out"]["bias"][:] = 0
    fp["out"]["kernel"][0, 0] = 1.0
    fp["out"]["kernel"][1, 0] = -1.0
    fp["out"]["bias"][0] = -0.35
    params = dict(params)
    params["field"] = fp
    # Upsampler bias writes a constant positive disc feature everywhere so
    # the handcrafted field yields a solid slab (guaranteed surface).
    up = _jax.tree.map(_np.array, params["upsampler"])
    up["kernel"][:] = 0
    up["bias"][:] = 0
    # Channel layout is (tri, r1, r2) c-major: ch0's shuffle slots are the
    # first upsample_ratio^2 entries.
    up["bias"][: scfg.upsample_ratio**2] = 0.6
    params["upsampler"] = up

    recon = SVRMReconstruction(novel_views=None, cfg=scfg, params=params)
    assert ReconstructionStage(cfg, loader, save_dir, "val",
                               backend=recon).run(0, 1) == 1
    sd = SceneDir(f"{save_dir}/val/{scene_dir_name('000000000007.jpg')}")
    obj_id = sd.list_crop_ids()[0]
    mesh = load_glb(sd.object_mesh(obj_id))
    assert not mesh.is_empty

    cp = np.load(sd.crop_params(obj_id))
    vmin, vmax = mesh.vertices.min(0), mesh.vertices.max(0)
    T_gt = np.eye(4)
    T_gt[:3, :3] = (gt["extent_x"] / max(vmax[0] - vmin[0], 1e-3)) * np.diag([1.0, -1.0, -1.0])
    T_gt[:3, 3] = gt["center"]
    matcher = OracleMatcher(scene_gen.intrinsics(), T_gt, depth,
                            crop_params=(float(cp[0]), float(cp[1]), float(cp[2])))
    assert LayoutStage(cfg, loader, save_dir, "val", matcher=matcher).run(0, 1) == 1
    assert len(json.loads(sd.bbox3d.read_text())) == 1
    out = ExportStage(save_dir, "val").run()
    assert len(out["annotations"]) == 1
