"""Depth-driven 3D box stage (the geometric core of stage 7, batched).

Produces `3dbbox.json` + `bboxes.json` for each scene directly from the
aligned depth map and the COCONUT instance masks — the depth-only labeling
fast path (SURVEY.md §7 "minimum end-to-end slice"). The full generative
path (mesh reconstruction + MASt3R registration) upgrades per-object
`canonical_upright` vectors and mesh-sampled points; this stage accepts both
(mesh-backed points can be fed through the same `label_instances` program).

Output schema parity: `src/util_3dbox.py:283-289` — per object
{obj_id, category_name, center_cam, R_cam, dimensions, bbox3D_cam}.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from labelany3d_tpu.data.coconut import xywh_to_xyxy
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.labeling import label_program
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages.common import (
    pack_instance_masks,
    pad_instances,
    resize_nearest,
)


class BoxStage:
    def __init__(self, cfg: PipelineConfig, loader, save_dir: str, split: str,
                 instance_provider=None):
        from labelany3d_tpu.data.sources import CoconutInstanceProvider

        self.cfg = cfg
        self.loader = loader
        self.save_dir = save_dir
        self.split = split
        self.provider = instance_provider or CoconutInstanceProvider(loader)
        self._key = jax.random.PRNGKey(cfg.seed + 7)
        # Masks arrive bit-packed ((B, H, W) bitfield, instance i in bit i)
        # and unpack on device: I-fold fewer mask bytes over the tunnel.
        # Shared module-level program (see labeling.label_program).
        self._step = label_program(
            cfg.max_instances, cfg.num_points, cfg.bbox_method
        )

    def _scene(self, image_info: dict) -> SceneDir:
        name = scene_dir_name(image_info["file_name"])
        return SceneDir(os.path.join(self.save_dir, self.split, name)).ensure()

    def _prep(self, item):
        """Per-scene host prep (PNG/RLE decode, depth read, bucket resizes):
        runs on prefetch workers so it overlaps the device flushes."""
        info, scene = item
        cfg = self.cfg
        image = None
        if getattr(self.provider, "needs_image", True) and scene.input_image.exists():
            from PIL import Image

            image = np.asarray(Image.open(scene.input_image).convert("RGB"))
        inst = self.provider.instances(info, image)
        if len(inst) == 0:
            return None
        depth = scene.read_depth()
        cam = scene.read_cam_params()
        K = np.asarray(cam["K"], np.float32)
        oh, ow = depth.shape
        # Resolution bucket for the device program.
        bh, bw = cfg.image_height, cfg.image_width
        depth_b = resize_nearest(depth, bh, bw).astype(np.float32)
        masks_b = resize_nearest(inst.masks, bh, bw)
        K_b = K.copy()
        K_b[0] *= bw / ow
        K_b[1] *= bh / oh
        masks_p, kept = pad_instances(masks_b, cfg.max_instances)
        # Pack on the prefetch worker (off the device-feed critical path).
        packed = pack_instance_masks(masks_p)
        return (scene, inst.labels, xywh_to_xyxy(inst.bboxes), depth_b, K_b,
                packed, kept)

    def run(self, start_index: int, end_index: int) -> int:
        from concurrent.futures import ThreadPoolExecutor

        from labelany3d_tpu.data.prefetch import Prefetcher

        cfg = self.cfg
        pending = []  # (scene, labels, bboxes_xyxy, depth, K, masks_padded, kept)
        done = 0
        writes = []

        def write_one(scene, bbox_list, bboxes_xyxy):
            scene.write_bbox3d(bbox_list)
            scene.write_bboxes2d(bboxes_xyxy)
            try:  # overlay parity (draw_cube, stage-7 artifact)
                from labelany3d_tpu.utils.visualization import draw_cube_overlay

                if scene.input_image.exists():
                    draw_cube_overlay(scene)
            except Exception as e:
                print(f"overlay failed: {e}")

        from threading import Semaphore

        # As in DepthStage: flush only dispatches the (lazy) device step and
        # hands the handles to a fetch worker, so batch N+1's boxfit overlaps
        # batch N's result download + JSON/overlay writes; at most 2 batches
        # of device results in flight.
        inflight = Semaphore(2)

        def fetch_and_write(group, boxes_dev):
            try:
                boxes = jax.tree_util.tree_map(np.asarray, boxes_dev)
            finally:
                inflight.release()
            for row, (scene, labels, bboxes_xyxy, *_rest, kept) in enumerate(group):
                bbox_list = []
                for i, label in enumerate(labels):
                    if i >= cfg.max_instances or not kept[i] or not boxes.ok[row, i]:
                        continue
                    bbox_list.append(
                        {
                            "obj_id": str(i),
                            "category_name": label.replace(" ", "_"),
                            "center_cam": boxes.center_cam[row, i].tolist(),
                            "R_cam": boxes.R_cam[row, i].tolist(),
                            "dimensions": boxes.dimensions[row, i].tolist(),
                            "bbox3D_cam": boxes.vertices[row, i].tolist(),
                        }
                    )
                write_one(scene, bbox_list, bboxes_xyxy)

        def flush(pool):
            nonlocal done
            if not pending:
                return
            depth = np.stack([p[3] for p in pending])
            K = np.stack([p[4] for p in pending])
            masks = np.stack([p[5] for p in pending])
            self._key, sub = jax.random.split(self._key)
            inflight.acquire()
            out = self._step(depth, K, masks, sub)
            writes.append(pool.submit(fetch_and_write, list(pending), out.boxes))
            done += len(pending)
            pending.clear()

        todo = []
        for idx in range(start_index, end_index):
            info = self.loader.get_image_by_index(idx)
            scene = self._scene(info)
            if scene.boxes_done() or not scene.depth_done():
                continue
            todo.append((info, scene))

        prepped = Prefetcher(todo, self._prep,
                             depth=2 * cfg.batch_size, num_workers=4)
        with ThreadPoolExecutor(max_workers=2) as pool:
            for item in prepped:
                if item is None:
                    continue
                pending.append(item)
                if len(pending) == cfg.batch_size:
                    flush(pool)
            flush(pool)
            for w in writes:
                w.result()  # surface write errors
        return done
