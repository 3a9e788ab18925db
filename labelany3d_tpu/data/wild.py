"""In-the-wild segmentation front-end (no COCONUT labels).

Parity targets in the reference repo (`src/model_wrappers.py`):
  * `filter_component_masks` (:31-37): keep masks whose foreground overlap
    ratio exceeds 0.5;
  * `run_entityv2` (:482-543): class-agnostic instance masks (CropFormer);
  * `run_clipseg` (:549-582): text-prompted foreground mask (background
    prompts thresholded at 0.5 OR'd against foreground prompts at 0.1);
  * `run_ovsam` (:616-632): open-vocabulary labels per mask.

Backend protocols + registry keys ('wild_segmentation', 'wild_foreground',
'wild_tagger') make the heavy models pluggable; shipped baselines are
deterministic geometric stand-ins (watershed-style color segmentation, a
border-prior foreground model, and an 'object' tagger) so the wild-mode
path runs end-to-end today, upgraded by converted checkpoints later.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

import numpy as np

from labelany3d_tpu.data.coconut import InstanceSet


def filter_component_masks(
    masks: np.ndarray, foreground_mask: np.ndarray, threshold: float = 0.5
) -> tuple[np.ndarray, np.ndarray]:
    """Split mask indices into (foreground, background) by overlap ratio.

    Exact parity with `src/model_wrappers.py:31-37` (including the 1e-6
    numerator/denominator epsilons).
    """
    masks = np.asarray(masks, bool)
    fg = np.asarray(foreground_mask, bool)
    all_instances = np.arange(len(masks))
    ratio = ((masks & fg).sum((-1, -2)) + 1e-6) / (masks.sum((-1, -2)) + 1e-6)
    is_fg = ratio > threshold
    return all_instances[is_fg], all_instances[~is_fg]


class SegmentationBackend(Protocol):
    def segment(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (I, H, W) bool class-agnostic instance masks."""
        ...


class ForegroundBackend(Protocol):
    def foreground(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) -> (H, W) bool foreground mask."""
        ...


class TaggerBackend(Protocol):
    def tag(self, image: np.ndarray, masks: np.ndarray) -> list[str]:
        """Per-mask category names."""
        ...


class ColorSegmentation:
    """Deterministic class-agnostic baseline: quantized-color connected
    components (EntityV2 stand-in). Adequate for tests and as a fallback."""

    def __init__(self, levels: int = 4, min_area: int = 400, max_instances: int = 16):
        self.levels = levels
        self.min_area = min_area
        self.max_instances = max_instances

    def segment(self, image: np.ndarray) -> np.ndarray:
        import cv2

        img = np.asarray(image)
        q = (img // (256 // self.levels)).astype(np.int32)
        label_img = q[..., 0] * self.levels * self.levels + q[..., 1] * self.levels + q[..., 2]
        masks = []
        for value in np.unique(label_img):
            region = (label_img == value).astype(np.uint8)
            n, comp = cv2.connectedComponents(region)
            for c in range(1, n):
                m = comp == c
                if m.sum() >= self.min_area:
                    masks.append(m)
        masks.sort(key=lambda m: -m.sum())
        masks = masks[: self.max_instances]
        if not masks:
            return np.zeros((0,) + img.shape[:2], bool)
        return np.stack(masks)


class BorderPriorForeground:
    """CLIPSeg stand-in: pixels whose color matches the image border's
    dominant colors are background; the rest is foreground."""

    def __init__(self, border: int = 8, tol: int = 30):
        self.border = border
        self.tol = tol

    def foreground(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.int32)
        b = self.border
        border_px = np.concatenate(
            [img[:b].reshape(-1, 3), img[-b:].reshape(-1, 3),
             img[:, :b].reshape(-1, 3), img[:, -b:].reshape(-1, 3)]
        )
        bg_color = np.median(border_px, axis=0)
        dist = np.abs(img - bg_color).sum(axis=-1)
        return dist > self.tol


class ConstantTagger:
    """OVSAM stand-in: labels every mask 'object' (open-vocab models plug
    in via the 'wild_tagger' registry key)."""

    def tag(self, image: np.ndarray, masks: np.ndarray) -> list[str]:
        return ["object"] * len(masks)


@dataclass
class WildInstanceSource:
    """Replaces the COCONUT loader for unlabeled images (reference stack E:
    entityv2 -> clipseg/oneformer filter -> ovsam tags)."""

    segmentation: SegmentationBackend
    foreground: ForegroundBackend
    tagger: TaggerBackend
    overlap_threshold: float = 0.5

    def read_instances(self, image: np.ndarray) -> InstanceSet:
        masks = self.segmentation.segment(image)
        h, w = image.shape[:2]
        if len(masks) == 0:
            return InstanceSet(
                bboxes=np.zeros((0, 4)), masks=np.zeros((0, h, w), bool),
                labels=[], category_ids=[],
            )
        fg = self.foreground.foreground(image)
        keep, _drop = filter_component_masks(masks, fg, self.overlap_threshold)
        masks = masks[keep]
        labels = self.tagger.tag(image, masks)
        bboxes = []
        for m in masks:
            ys, xs = np.nonzero(m)
            bboxes.append([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1])
        return InstanceSet(
            bboxes=np.asarray(bboxes, np.float64).reshape(-1, 4),
            masks=masks,
            labels=labels,
            category_ids=[-1] * len(masks),
        )


def default_wild_source() -> WildInstanceSource:
    return WildInstanceSource(ColorSegmentation(), BorderPriorForeground(), ConstantTagger())
