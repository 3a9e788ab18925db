"""Aspect-ratio buckets in the depth stage (mixed-aspect batching)."""

import numpy as np

from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages.depth import DepthStage


def test_bucket_sizes_equal_area_and_snapped():
    cfg = PipelineConfig(image_height=512, image_width=512,
                         aspect_buckets=(0.5, 1.0, 2.0))
    sizes = cfg.bucket_sizes()
    assert all(h % 16 == 0 and w % 16 == 0 for h, w in sizes)
    area = 512 * 512
    for h, w in sizes:
        assert abs(h * w - area) / area < 0.15  # roughly equal compute
    assert sizes[1] == (512, 512)
    # pick_bucket: aspect routing
    assert cfg.pick_bucket(400, 800) == sizes[2]   # wide -> 2.0 bucket
    assert cfg.pick_bucket(800, 400) == sizes[0]   # tall -> 0.5 bucket
    assert cfg.pick_bucket(500, 520) == sizes[1]


def test_pick_bucket_single_is_default():
    cfg = PipelineConfig(image_height=256, image_width=256)
    assert cfg.pick_bucket(123, 777) == (256, 256)


class _ShapeRecordingBackend:
    """Constant-depth backend that records the batch shapes it sees."""

    def __init__(self):
        self.shapes = []

    def infer(self, images):
        b, h, w, _ = images.shape
        self.shapes.append((b, h, w))
        d = np.full((b, h, w), 4.0, np.float32)
        K = np.tile(np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]],
                             np.float32), (b, 1, 1))
        return {"relative_depth": d, "metric_depth": d * 2,
                "depth_mask": np.ones((b, h, w), bool), "K_pixels": K}


class _Loader:
    def __init__(self, infos):
        self.infos = infos

    def get_image_by_index(self, i):
        return self.infos[i]

    def __len__(self):
        return len(self.infos)


class _Source:
    def __init__(self, imgs):
        self.imgs = imgs

    def get(self, info):
        return self.imgs[info["id"]]


def test_depth_stage_groups_by_aspect(tmp_path):
    rng = np.random.default_rng(0)
    # two wide images + one tall image
    imgs = {
        0: rng.integers(0, 255, (120, 240, 3)).astype(np.uint8),
        1: rng.integers(0, 255, (128, 256, 3)).astype(np.uint8),
        2: rng.integers(0, 255, (240, 120, 3)).astype(np.uint8),
    }
    infos = [{"id": i, "file_name": f"{i:012d}.jpg"} for i in range(3)]
    cfg = PipelineConfig(batch_size=2, image_height=128, image_width=128,
                         aspect_buckets=(0.5, 1.0, 2.0))
    backend = _ShapeRecordingBackend()
    stage = DepthStage(cfg, backend, _Loader(infos), _Source(imgs),
                       str(tmp_path), "val")
    assert stage.run(0, 3) == 3

    # wide pair flushed together at the 2.0 bucket; tall image alone at 0.5
    wide = cfg.bucket_sizes()[2]
    tall = cfg.bucket_sizes()[0]
    assert sorted(backend.shapes) == sorted([(2, *wide), (1, *tall)])

    # artifacts at original resolutions with aspect-corrected K
    import json

    for i, (oh, ow) in [(0, (120, 240)), (2, (240, 120))]:
        sd = SceneDir(str(tmp_path / "val" / scene_dir_name(infos[i]["file_name"])))
        d = np.load(sd.depth_map)
        assert d.shape == (oh, ow)
        cam = json.loads(sd.cam_params.read_text())
        assert cam["W"] == ow and cam["H"] == oh
