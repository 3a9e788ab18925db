"""Stage 3: per-instance square crops + crop params.

Parity target: `src/batch_scripts/get_crops_enhanced.py` — filter COCONUT
instances, 7x7 binary opening, 6400-px minimum, square padded crops at 512
from the (4x enhanced) image, crop params divided back to original coords,
`bboxes.json` with the selected XYXY boxes.

This implementation crops from the *original* image by default (enhancement
is a pluggable registry backend; when an enhanced image exists in the scene
dir it is used with the reference's 4x coordinate bookkeeping).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from labelany3d_tpu.data.coconut import xywh_to_xyxy
from labelany3d_tpu.geometry.crops import crop_object_params, crop_resample
from labelany3d_tpu.geometry.masks import binary_opening, upscale_mask_nearest
from labelany3d_tpu.pipeline.config import PipelineConfig
from labelany3d_tpu.pipeline.scene import SceneDir, scene_dir_name
from labelany3d_tpu.pipeline.stages.common import ImageSource


class CropStage:
    def __init__(
        self,
        cfg: PipelineConfig,
        loader,
        image_source: ImageSource,
        save_dir: str,
        split: str,
        crop_size: int = 512,
        min_mask_pixels: int = 6400,
        instance_provider=None,
    ):
        from labelany3d_tpu.data.sources import CoconutInstanceProvider

        self.cfg = cfg
        self.loader = loader
        self.image_source = image_source
        self.save_dir = save_dir
        self.split = split
        self.crop_size = crop_size
        self.min_mask_pixels = min_mask_pixels
        self.provider = instance_provider or CoconutInstanceProvider(loader)
        self._jitted = {}

    def _crop_program(self, img_hw: tuple, mask_hw: tuple, factor: int):
        """One jitted program per shape bucket: mask upscale + opening +
        crop geometry + resample. Eagerly these were ~4 multi-op device
        calls PER INSTANCE with the full image re-uploaded each time
        (tunnel round trips); now it is one dispatch per instance against
        an image uploaded once per scene."""
        key = (img_hw, mask_hw, factor)
        if key in self._jitted:
            return self._jitted[key]

        @jax.jit
        def run(image_f32, mask_bool):
            m = upscale_mask_nearest(mask_bool, factor) if factor > 1 else mask_bool
            m = binary_opening(m, size=7)
            params = crop_object_params(m, crop_size=self.crop_size)
            rgb, mcrop = crop_resample(image_f32, m, params, self.crop_size)
            meta = jnp.stack([params.offset_x, params.offset_y, params.scale])
            return rgb, mcrop, meta, m.sum()

        self._jitted[key] = run
        return run

    @staticmethod
    def _pad_to(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
        """Zero-pad H/W up to (th, tw). Padding cannot change crop values:
        the resample zeroes every tap outside the object rect, and the rect
        coordinates are data, not shape. Bucketing keeps the jit cache small
        on mixed-resolution datasets."""
        h, w = arr.shape[:2]
        if th == h and tw == w:
            return arr
        pad = [(0, th - h), (0, tw - w)] + [(0, 0)] * (arr.ndim - 2)
        return np.pad(arr, pad)

    @staticmethod
    def _bucket_hw(h: int, w: int, bucket: int = 256) -> tuple[int, int]:
        return (((h + bucket - 1) // bucket) * bucket,
                ((w + bucket - 1) // bucket) * bucket)

    def run(self, start_index: int, end_index: int) -> int:
        from PIL import Image

        done = 0
        for idx in range(start_index, end_index):
            info = self.loader.get_image_by_index(idx)
            name = scene_dir_name(info["file_name"])
            scene = SceneDir(os.path.join(self.save_dir, self.split, name)).ensure()
            base_image = self.image_source.get(info)
            inst = self.provider.instances(info, base_image)
            if len(inst) == 0:
                continue

            use_enhanced = scene.enhanced_image.exists()
            if use_enhanced:
                image = np.asarray(Image.open(scene.enhanced_image).convert("RGB"))
                factor = 4  # reference upscales masks 4x to the enhanced res
            else:
                image = base_image
                factor = 1

            bboxes_xyxy = xywh_to_xyxy(inst.bboxes)
            # Base-res mask bucket; image pads to exactly factor x that
            # bucket so the upscaled mask and image shapes agree.
            mh, mw = self._bucket_hw(*inst.masks[0].shape)
            img_p = self._pad_to(image, mh * factor, mw * factor)
            img_dev = jnp.asarray(img_p, jnp.float32)  # uploaded once/scene
            fn = None
            selected = []
            # Reference iterates instances in reverse (`get_crops_enhanced.py:85`).
            for i in range(len(inst) - 1, -1, -1):
                label = inst.labels[i].replace(" (", ", ").replace(")", "")
                obj_id = f"{i}_{label.replace(' ', '_')}"
                mask_p = self._pad_to(inst.masks[i], mh, mw)
                if fn is None:
                    fn = self._crop_program(img_p.shape[:2], mask_p.shape, factor)
                rgb, mcrop, meta, msum = fn(img_dev, jnp.asarray(mask_p))
                if int(msum) < self.min_mask_pixels * (factor * factor) / 16:
                    # 6400 px threshold is defined at 4x; scale for 1x crops.
                    continue
                selected.append(bboxes_xyxy[i])
                if scene.crops_done(obj_id):
                    continue
                rgba = np.concatenate(
                    [
                        np.clip(np.asarray(rgb), 0, 255).astype(np.uint8),
                        (np.asarray(mcrop)[..., None] * 255).astype(np.uint8),
                    ],
                    axis=-1,
                )
                Image.fromarray(rgba).save(scene.crop(obj_id))
                # Params stored in original-image coordinates (divide by the
                # enhancement factor, `get_crops_enhanced.py:98`).
                ox, oy, sc = np.asarray(meta, np.float64)
                np.save(
                    scene.crop_params(obj_id),
                    np.array([ox / factor, oy / factor, sc * factor]),
                )
            scene.write_bboxes2d(np.asarray(selected, np.float64))
            done += 1
        return done
