"""Stage 1: depth estimation + RANSAC alignment (batched on device).

Parity target: `src/batch_scripts/depth.py` — per image: MoGe relative depth
and intrinsics, DepthPro metric depth conditioned on MoGe's focal, RANSAC
alignment, then `depth_map.npy` / `cam_params.json` / `input.png` artifacts
and skip-if-exists resume.

TPU-first: images are processed in fixed-size batches at a resolution
bucket; the model forward passes and the RANSAC alignment are one jitted
program per bucket. Only artifact IO is per-image host work.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from labelany3d_tpu.pipeline.backends import DepthBackend
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.labeling import depth_fusion_program
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages.common import ImageSource, resize_image, resize_nearest


class DepthStage:
    def __init__(
        self,
        cfg: PipelineConfig,
        backend: DepthBackend,
        loader,
        image_source: ImageSource,
        save_dir: str,
        split: str,
        write_ply: bool = False,
    ):
        self.cfg = cfg
        self.backend = backend
        self.loader = loader
        self.image_source = image_source
        self.save_dir = save_dir
        self.split = split
        self.write_ply = write_ply
        self._key = jax.random.PRNGKey(cfg.seed)
        # depth_fusion must run as ONE program: eagerly it dispatches the
        # RANSAC align op-by-op (hundreds of ops per batch; over the axon
        # tunnel every eager op is a remote round trip). Shared module-level
        # wrapper: per-instance jax.jit re-traces/re-loads per stage object.
        self._fuse = depth_fusion_program

    def _scene(self, image_info: dict) -> SceneDir:
        name = scene_dir_name(image_info["file_name"])
        return SceneDir(os.path.join(self.save_dir, self.split, name)).ensure()

    def run(self, start_index: int, end_index: int) -> int:
        """Process [start_index, end_index); returns #images computed.

        Images are grouped into aspect-ratio buckets (cfg.aspect_buckets):
        each bucket is a separate static-shape jitted program; mixed-aspect
        datasets keep near-native aspect instead of squashing to a square
        (the reference processes per-image native resolution; fixed buckets
        are the batched TPU equivalent).
        """
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.cfg
        pending: dict[tuple, list[tuple[dict, SceneDir, np.ndarray, np.ndarray]]] = {}
        done = 0
        writes = []
        io_pool = ThreadPoolExecutor(max_workers=2)

        from threading import Semaphore

        # At most 2 batches of device results in flight: flush() only
        # dispatches (lazy under the tunnel backend) and hands the device
        # handles to a fetch worker, so batch N+1's forward overlaps batch
        # N's result download + artifact writes. Blocking the fetch inside
        # flush measured ~2.5x the device time per batch (tunnel round
        # trips + PNG/npy encode all serialized on the feed thread).
        inflight = Semaphore(2)

        def flush(bucket):
            nonlocal done
            group = pending.get(bucket, [])
            if not group:
                return
            # Bucket resizes already happened on the prefetch workers; the
            # batch ships as uint8 (backend normalizes on device).
            batch = np.stack([r for _, _, _, r in group])
            inflight.acquire()
            out = self.backend.infer(batch)
            self._key, sub = jax.random.split(self._key)
            aligned_dev = self._fuse(
                out["relative_depth"], out["metric_depth"], out["depth_mask"], sub
            )
            snapshot = list(group)
            writes.append(io_pool.submit(
                fetch_and_write, bucket, snapshot, aligned_dev, out["K_pixels"]))
            done += len(group)
            group.clear()

        def fetch_and_write(bucket, group, aligned_dev, K_dev):
            try:
                aligned = np.asarray(aligned_dev)
                K_bucket = np.asarray(K_dev)
            finally:
                inflight.release()
            bh, bw = bucket
            for row, (info, scene, img, _r) in enumerate(group):
                write_one(bucket, scene, img, aligned[row], K_bucket[row])

        def write_one(bucket, scene, img, row_depth, K_row):
            bh, bw = bucket
            oh, ow = img.shape[:2]
            depth_full = resize_nearest(row_depth, oh, ow)
            sy, sx = oh / bh, ow / bw
            K = K_row.copy()
            K[0] *= sx
            K[1] *= sy
            scene.write_depth(depth_full)
            scene.write_cam_params(K, np.eye(4), ow, oh)
            if not scene.input_image.exists():
                from PIL import Image

                # compress_level=1: ~3x faster PNG encode on the per-image
                # host path; the artifact is an intermediate, not a deliverable.
                Image.fromarray(img).save(scene.input_image, compress_level=1)
            if self.write_ply:
                # depth_scene.ply + depth_scene_no_edge.ply artifact
                # parity (depth.py:49,157).
                from labelany3d_tpu.data.meshio import save_ply_mesh, save_ply_points
                from labelany3d_tpu.geometry.backproject import depth_to_points
                from labelany3d_tpu.geometry.edges import edge_filtered_scene_mesh

                pts_map = np.asarray(depth_to_points(depth_full, K))
                save_ply_points(
                    scene.root / "depth_scene.ply",
                    pts_map.reshape(-1, 3), img.reshape(-1, 3),
                )
                valid = (depth_full > 0) & (depth_full < 9000)
                mv, mf, mc = edge_filtered_scene_mesh(
                    pts_map, img, depth_full, valid
                )
                save_ply_mesh(scene.root / "depth_scene_no_edge.ply", mv, mf, mc)

        # Prefetch image decode on worker threads so host IO overlaps the
        # device batches (the reference loads synchronously per image,
        # depth.py:120-127).
        from labelany3d_tpu.data.prefetch import Prefetcher

        todo = []
        for i in range(start_index, end_index):
            info = self.loader.get_image_by_index(i)
            scene = self._scene(info)
            if scene.depth_done():
                continue
            todo.append((info, scene))

        def load(item):
            info, scene = item
            img = self.image_source.get(info)
            bucket = cfg.pick_bucket(*img.shape[:2])
            # Bucket resize on the worker: off the device-feed critical path.
            resized = resize_image(img, *bucket)
            return info, scene, img, bucket, resized

        loaded = Prefetcher(todo, load, depth=2 * cfg.batch_size, num_workers=4)
        try:
            for info, scene, img, bucket, resized in loaded:
                pending.setdefault(bucket, []).append((info, scene, img, resized))
                if len(pending[bucket]) == cfg.batch_size:
                    flush(bucket)
            for bucket in list(pending):
                flush(bucket)
            for w in writes:
                w.result()  # surface write errors
        finally:
            io_pool.shutdown(wait=True)
        return done
