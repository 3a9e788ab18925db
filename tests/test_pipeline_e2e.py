"""End-to-end pipeline test on a synthetic scene with analytic ground truth.

Exercises the full depth-only labeling path hermetically (SURVEY.md §4 test
strategy): fake depth backend -> DepthStage -> CropStage -> BoxStage ->
ExportStage, asserting box dimensions/centers against closed-form truth and
the Omni3D JSON schema against the reference contract.
"""

import json

import numpy as np
import pytest

from labelany3d_tpu.data.rle import rle_encode
from labelany3d_tpu.models.fakes import FakeScene
from labelany3d_tpu.pipeline.backends import FakeDepthBackend
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.labeling import label_instances
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages import BoxStage, CropStage, DepthStage, ExportStage
from labelany3d_tpu.pipeline.stages.common import ArrayImageSource


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


@pytest.fixture
def synthetic_world():
    scene = FakeScene(width=192, height=160, fx=150.0, fy=150.0)
    # Two objects, big enough to pass the 6.25%-height and area filters.
    objects = [
        {"z": 4.0, "rect": (30, 40, 80, 110)},
        {"z": 6.0, "rect": (110, 50, 170, 120)},
    ]
    img, depth, masks, gts = scene.make(objects)
    annos = []
    for i, m in enumerate(masks):
        rle = rle_encode(m)
        ys, xs = np.nonzero(m)
        annos.append(
            {
                "image_id": 1,
                "category_id": 62 if i == 0 else 3,  # chair, car
                "iscrowd": 0,
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)],
                "segmentation": {"size": rle["size"], "counts": rle["counts"].decode()},
            }
        )
    images = [{"id": 1, "file_name": "000000000042.jpg",
               "height": scene.height, "width": scene.width}]
    loader = _ToyLoader(images, {1: annos})
    source = ArrayImageSource({1: img})
    return scene, img, depth, masks, gts, loader, source


def test_mask_bitpack_roundtrip():
    import jax

    from labelany3d_tpu.pipeline.labeling import unpack_instance_masks
    from labelany3d_tpu.pipeline.stages.common import pack_instance_masks

    rng = np.random.default_rng(3)
    for n_inst, dtype in ((5, np.uint8), (16, np.uint16), (32, np.uint32)):
        masks = rng.uniform(size=(n_inst, 24, 40)) > 0.6
        packed = pack_instance_masks(masks)
        assert packed.dtype == dtype
        # batched device unpack (as BoxStage ships it)
        got = np.asarray(
            jax.jit(lambda p: unpack_instance_masks(p, n_inst))(packed[None])
        )[0]
        np.testing.assert_array_equal(got, masks)


def test_label_instances_analytic(synthetic_world):
    import jax

    scene, img, depth, masks, gts, loader, source = synthetic_world
    K = scene.intrinsics()
    out = label_instances(
        depth[None].astype(np.float32),
        K[None].astype(np.float32),
        masks[None],
        jax.random.PRNGKey(0),
        num_points=512,
    )
    boxes = jax.tree_util.tree_map(np.asarray, out.boxes)
    assert boxes.ok[0].all()
    for i, gt in enumerate(gts):
        dims = np.sort(boxes.dimensions[0, i])  # [~0, extent_y, extent_x] sorted
        expect = np.sort([gt["extent_x"], gt["extent_y"], 0.0])
        np.testing.assert_allclose(dims, expect, atol=0.15)
        np.testing.assert_allclose(boxes.center_cam[0, i], gt["center"], atol=0.15)


def test_full_pipeline_stages(tmp_path, synthetic_world):
    scene, img, depth, masks, gts, loader, source = synthetic_world
    save_dir = str(tmp_path / "results")
    cfg = PipelineConfig(
        batch_size=2, max_instances=8, num_points=512,
        image_height=scene.height, image_width=scene.width, use_fakes=True,
    )
    backend = FakeDepthBackend(depth[None], scene.intrinsics())

    n = DepthStage(cfg, backend, loader, source, save_dir, "val").run(0, 1)
    assert n == 1
    sd = SceneDir(f"{save_dir}/val/{scene_dir_name('000000000042.jpg')}")
    assert sd.depth_done()
    stored_depth = sd.read_depth()
    # RANSAC alignment recovers metric scale from the 0.5x relative map.
    mask_all = np.isfinite(depth)
    np.testing.assert_allclose(stored_depth[mask_all], depth[mask_all], rtol=2e-2)

    n = CropStage(cfg, loader, source, save_dir, "val").run(0, 1)
    assert n == 1
    crop_ids = sd.list_crop_ids()
    assert len(crop_ids) == 2
    for cid in crop_ids:
        assert sd.crop_params(cid).exists()

    n = BoxStage(cfg, loader, save_dir, "val").run(0, 1)
    assert n == 1
    bbox_list = sd.read_bbox3d()
    assert len(bbox_list) == 2
    names = {b["category_name"] for b in bbox_list}
    assert names == {"chair", "car"}
    for b in bbox_list:
        assert set(b) >= {"obj_id", "category_name", "center_cam", "R_cam",
                          "dimensions", "bbox3D_cam"}
        assert np.asarray(b["bbox3D_cam"]).shape == (8, 3)
        gt = gts[int(b["obj_id"])]
        np.testing.assert_allclose(b["center_cam"], gt["center"], atol=0.2)

    out = ExportStage(save_dir, "val").run()
    assert len(out["images"]) == 1
    assert len(out["annotations"]) == 2
    anno = out["annotations"][0]
    assert anno["dataset_id"] == 22
    assert anno["image_id"] == 1000000
    assert "bbox2D_tight" in anno and "bbox2D_proj" in anno
    # The exported file exists and parses.
    saved = json.loads((tmp_path / "results" / "COCO3D_val.json").read_text())
    assert saved["info"]["id"] == 22


def test_fused_fast_stage_matches_chain(tmp_path, synthetic_world):
    """FusedFastStage writes the union of DepthStage+BoxStage artifacts and
    its boxes match the stage chain's against the analytic ground truth."""
    from labelany3d_tpu.pipeline.stages.fused import FusedFastStage

    scene, img, depth, masks, gts, loader, source = synthetic_world
    save_dir = str(tmp_path / "fused")
    cfg = PipelineConfig(
        batch_size=2, max_instances=8, num_points=512,
        image_height=scene.height, image_width=scene.width, use_fakes=True,
    )
    backend = FakeDepthBackend(depth[None], scene.intrinsics())
    n = FusedFastStage(cfg, backend, loader, source, save_dir, "val").run(0, 1)
    assert n == 1
    sd = SceneDir(f"{save_dir}/val/{scene_dir_name('000000000042.jpg')}")
    # Union of both stages' artifacts, written in one pass.
    assert sd.depth_done() and sd.boxes_done()
    assert sd.input_image.exists()
    assert (sd.root / "vis_3dbox.png").exists()
    stored_depth = sd.read_depth()
    mask_all = np.isfinite(depth)
    np.testing.assert_allclose(stored_depth[mask_all], depth[mask_all], rtol=2e-2)
    bbox_list = sd.read_bbox3d()
    assert len(bbox_list) == 2
    for b in bbox_list:
        gt = gts[int(b["obj_id"])]
        np.testing.assert_allclose(b["center_cam"], gt["center"], atol=0.2)
    # Resume: everything done -> 0 processed.
    backend2 = FakeDepthBackend(depth[None], scene.intrinsics())
    assert FusedFastStage(cfg, backend2, loader, source, save_dir, "val").run(0, 1) == 0
    out = ExportStage(save_dir, "val").run()
    assert len(out["images"]) == 1 and len(out["annotations"]) == 2


def test_pipeline_resume_skips_done(tmp_path, synthetic_world):
    scene, img, depth, masks, gts, loader, source = synthetic_world
    save_dir = str(tmp_path / "results")
    cfg = PipelineConfig(batch_size=1, max_instances=8,
                         image_height=scene.height, image_width=scene.width)
    backend = FakeDepthBackend(np.repeat(depth[None], 3, axis=0), scene.intrinsics())
    assert DepthStage(cfg, backend, loader, source, save_dir, "val").run(0, 1) == 1
    # Second run: skip-if-exists (no new images consumed from the backend).
    assert DepthStage(cfg, backend, loader, source, save_dir, "val").run(0, 1) == 0


def test_runner_cli_parser():
    from labelany3d_tpu.pipeline.runner import build_parser

    p = build_parser()
    args, extras = p.parse_known_args(
        ["boxes", "--start_index", "3", "--end_index", "9", "--split", "train",
         "compute.batch_size=2"]
    )
    assert args.stage == "boxes" and args.start_index == 3 and args.split == "train"
    assert extras == ["compute.batch_size=2"]


def test_config_overrides(tmp_path):
    from labelany3d_tpu.pipeline.config import PipelineConfig, load_config

    yml = tmp_path / "cfg.yaml"
    yml.write_text("compute:\n  batch_size: 4\nrun:\n  bbox_method: minarea\n")
    cfg = load_config(str(yml), ["compute.max_instances=3", "models.use_fakes=true"])
    assert cfg.compute.batch_size == 4
    assert cfg.run.bbox_method == "minarea"
    assert cfg.compute.max_instances == 3
    pc = PipelineConfig.from_node(cfg)
    assert pc.batch_size == 4 and pc.max_instances == 3 and pc.use_fakes
