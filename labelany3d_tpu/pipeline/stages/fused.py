"""Fused fast path: depth + 3D boxes in one pass, artifacts written once.

The stage-chain `fast` mode (DepthStage -> BoxStage) round-trips every
intermediate through the scene directory: the box stage re-decodes
`input.png`, re-reads `depth_map.npy`, re-resizes both back to the bucket
the depth stage just computed at, and the overlay re-opens the PNG a third
time. On the one-core bench host that disk relay is most of the wall clock
once the device programs are jitted.

This stage is SURVEY.md §7's design stance made literal — "a single JAX
program per stage group, batched over images": per batch it runs the depth
backend forward and one fused (RANSAC-align + mask-unpack + box-fit)
program, then writes the union of both stages' artifacts (depth_map.npy,
cam_params.json, input.png, 3dbbox.json, bboxes.json, vis_3dbox.png) from
the in-memory arrays. Outputs match the stage chain (same programs, same
scene-dir contract), so `--stage fast` resumes interchangeably with the
separate stages.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from labelany3d_tpu.data.coconut import xywh_to_xyxy
from labelany3d_tpu.pipeline.backends import DepthBackend
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.labeling import fused_label_program
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages.common import (
    ImageSource,
    pack_instance_masks,
    pad_instances,
    resize_image,
    resize_nearest,
)


class FusedFastStage:
    """Depth estimation + depth-only 3D box labeling, one pass per batch."""

    def __init__(
        self,
        cfg: PipelineConfig,
        backend: DepthBackend,
        loader,
        image_source: ImageSource,
        save_dir: str,
        split: str,
        instance_provider=None,
    ):
        from labelany3d_tpu.data.sources import CoconutInstanceProvider

        self.cfg = cfg
        self.backend = backend
        self.loader = loader
        self.image_source = image_source
        self.save_dir = save_dir
        self.split = split
        self.provider = instance_provider or CoconutInstanceProvider(loader)
        self._key = jax.random.PRNGKey(cfg.seed)
        # Wall-clock breakdown accumulated per run (diagnostics; read by
        # bench.py's e2e section): dispatch = lazy device-call submission,
        # fetch = device->host transfer of the batch results, write = host
        # artifact encode+IO. fetch/write run on pool threads and overlap
        # the next batch's dispatch, so the sum can exceed the run time.
        self.stats = {"dispatch_s": 0.0, "fetch_s": 0.0, "write_s": 0.0,
                      "batches": 0}

        # Shared module-level program: a per-instance jax.jit wrapper would
        # re-trace (and re-load over the tunnel) on every stage instance.
        self._label = fused_label_program(
            cfg.max_instances, cfg.num_points, cfg.bbox_method
        )

    def _scene(self, info: dict) -> SceneDir:
        return SceneDir(
            os.path.join(self.save_dir, self.split, scene_dir_name(info["file_name"]))
        ).ensure()

    def _prep(self, item):
        """Worker-side decode + bucket resize + instance pack."""
        info, scene = item
        cfg = self.cfg
        img = self.image_source.get(info)
        bucket = cfg.pick_bucket(*img.shape[:2])
        resized = resize_image(img, *bucket)
        image_for_provider = img if getattr(self.provider, "needs_image", True) else None
        inst = self.provider.instances(info, image_for_provider)
        if len(inst) == 0:
            return None
        masks_b = resize_nearest(inst.masks, *bucket)
        masks_p, kept = pad_instances(masks_b, cfg.max_instances)
        packed = pack_instance_masks(masks_p)
        return (info, scene, img, bucket, resized, packed, kept,
                inst.labels, xywh_to_xyxy(inst.bboxes))

    def run(self, start_index: int, end_index: int) -> int:
        from concurrent.futures import ThreadPoolExecutor
        from threading import Semaphore

        from labelany3d_tpu.data.prefetch import Prefetcher

        cfg = self.cfg
        pending: dict[tuple, list] = {}
        writes = []
        done = 0
        io_pool = ThreadPoolExecutor(max_workers=2)
        inflight = Semaphore(2)  # batches of device results in flight

        def flush(bucket):
            nonlocal done
            group = pending.get(bucket, [])
            if not group:
                return
            batch = np.stack([g[4] for g in group])  # uint8; device-normalized
            packed = np.stack([g[5] for g in group])
            inflight.acquire()
            t_disp = time.perf_counter()
            out = self.backend.infer(batch)
            self._key, sub = jax.random.split(self._key)
            aligned, boxes = self._label(
                out["relative_depth"], out["metric_depth"], out["depth_mask"],
                out["K_pixels"], packed, sub,
            )
            self.stats["dispatch_s"] += time.perf_counter() - t_disp
            self.stats["batches"] += 1
            snapshot = list(group)
            writes.append(io_pool.submit(
                fetch_and_write, bucket, snapshot, aligned, out["K_pixels"], boxes))
            done += len(group)
            group.clear()

        def fetch_and_write(bucket, group, aligned_dev, K_dev, boxes_dev):
            t_fetch = time.perf_counter()
            try:
                aligned = np.asarray(aligned_dev)
                K_bucket = np.asarray(K_dev)
                boxes = jax.tree_util.tree_map(np.asarray, boxes_dev)
            finally:
                inflight.release()
            t_write = time.perf_counter()
            self.stats["fetch_s"] += t_write - t_fetch
            bh, bw = bucket
            for row, (info, scene, img, _b, _r, _p, kept, labels, bb2d) in enumerate(group):
                oh, ow = img.shape[:2]
                depth_full = resize_nearest(aligned[row], oh, ow)
                K = K_bucket[row].copy()
                K[0] *= ow / bw
                K[1] *= oh / bh
                scene.write_depth(depth_full)
                scene.write_cam_params(K, np.eye(4), ow, oh)
                if not scene.input_image.exists():
                    from PIL import Image

                    Image.fromarray(img).save(scene.input_image, compress_level=1)
                bbox_list = []
                for i, label in enumerate(labels):
                    if i >= cfg.max_instances or not kept[i] or not boxes.ok[row, i]:
                        continue
                    bbox_list.append({
                        "obj_id": str(i),
                        "category_name": label.replace(" ", "_"),
                        "center_cam": boxes.center_cam[row, i].tolist(),
                        "R_cam": boxes.R_cam[row, i].tolist(),
                        "dimensions": boxes.dimensions[row, i].tolist(),
                        "bbox3D_cam": boxes.vertices[row, i].tolist(),
                    })
                scene.write_bbox3d(bbox_list)
                scene.write_bboxes2d(bb2d)
                try:
                    from labelany3d_tpu.utils.visualization import draw_cube_overlay

                    draw_cube_overlay(scene, image=img, K=K, cubes=bbox_list)
                except Exception as e:
                    print(f"overlay failed: {e}")
            self.stats["write_s"] += time.perf_counter() - t_write

        todo = []
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            if scene.depth_done() and scene.boxes_done():
                continue
            todo.append((info, scene))

        prepped = Prefetcher(todo, self._prep, depth=2 * cfg.batch_size, num_workers=4)
        try:
            for item in prepped:
                if item is None:
                    continue
                bucket = item[3]
                pending.setdefault(bucket, []).append(item)
                if len(pending[bucket]) == cfg.batch_size:
                    flush(bucket)
            for bucket in list(pending):
                flush(bucket)
            for w in writes:
                w.result()
        finally:
            io_pool.shutdown(wait=True)
        return done
