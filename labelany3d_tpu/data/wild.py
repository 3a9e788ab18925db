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


class SamSegmentation:
    """Learned class-agnostic segmenter (the reference's EntityV2/CropFormer
    role, `src/model_wrappers.py:482-543`): a SAM-architecture point-grid
    auto-segmenter (`models/sam.py`, transformers-oracle verified). Pass
    converted checkpoint params via `params` (docs/WEIGHTS.md); runs
    random-weight with a one-shot warning otherwise."""

    def __init__(self, cfg=None, params=None, max_instances: int = 16,
                 points_per_side: int = 8, **kw):
        from labelany3d_tpu.models.sam import SamAutoSegmentation, SamConfig

        self.auto = SamAutoSegmentation(
            cfg or SamConfig.vit_base(), params=params,
            points_per_side=points_per_side, **kw,
        )
        self.max_instances = max_instances

    def segment(self, image: np.ndarray) -> np.ndarray:
        masks = self.auto.segment(np.asarray(image, np.uint8))
        masks = masks[: self.max_instances]
        if not masks:
            return np.zeros((0,) + image.shape[:2], bool)
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


class ClipSegForeground:
    """Text-prompted foreground filter; exact semantics of the reference's
    `run_clipseg` (`src/model_wrappers.py:549-582`): per-prompt sigmoid maps,
    background prompts thresholded at 0.5 and OR-reduced, foreground prompts
    at 0.1, final mask = ~any(background) | any(foreground), resized to the
    image size.

    Runs a transformers `CLIPSegForImageSegmentation` on host (this is the
    labeling front-end, not the TPU compute path — same placement as the
    reference). Pass `model_path` pointing at a local snapshot of
    `CIDAS/clipseg-rd64-refined`, or inject (model, processor) directly
    (tiny random configs in tests).
    """

    BACKGROUND_PROMPTS = ("background", "floor", "wall", "curtain", "window",
                          "ceiling", "table")
    FOREGROUND_PROMPTS = ("object", "furniture")

    def __init__(self, model_path: str | None = None, model=None, processor=None,
                 bg_threshold: float = 0.5, fg_threshold: float = 0.1):
        if model is None:
            from transformers import CLIPSegForImageSegmentation, CLIPSegProcessor

            model = CLIPSegForImageSegmentation.from_pretrained(model_path)
            processor = CLIPSegProcessor.from_pretrained(model_path)
        self.model = model.eval()
        self.processor = processor
        self.bg_threshold = bg_threshold
        self.fg_threshold = fg_threshold

    def _predict_maps(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (P, h, w) sigmoid maps, prompts = bg + fg."""
        import torch
        from PIL import Image

        prompts = list(self.BACKGROUND_PROMPTS) + list(self.FOREGROUND_PROMPTS)
        pil = Image.fromarray(np.asarray(image, np.uint8))
        inputs = self.processor(
            text=prompts, images=[pil] * len(prompts),
            padding="max_length", return_tensors="pt",
        )
        with torch.no_grad():
            logits = self.model(**inputs).logits
        if logits.dim() == 2:  # single-image squeeze
            logits = logits[None]
        return torch.sigmoid(logits).numpy()

    def foreground(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image

        maps = self._predict_maps(image)
        fg = combine_prompt_maps(
            maps, len(self.BACKGROUND_PROMPTS), self.bg_threshold, self.fg_threshold
        )
        h, w = np.asarray(image).shape[:2]
        return np.array(Image.fromarray(fg).resize((w, h)))


def combine_prompt_maps(maps: np.ndarray, n_background: int,
                        bg_threshold: float = 0.5, fg_threshold: float = 0.1) -> np.ndarray:
    """run_clipseg's threshold/OR logic (`model_wrappers.py:577-580`)."""
    maps = np.asarray(maps)
    back = (maps[:n_background] > bg_threshold).any(axis=0)
    fore = (maps[n_background:] > fg_threshold).any(axis=0)
    return ~back | fore


class ClipTagger:
    """Open-vocabulary per-mask tagger (reference `run_ovsam` role,
    `model_wrappers.py:616-632`): crop each mask's bbox, score against a
    category vocabulary with CLIP, return the best name. Pass `model_path`
    to a local CLIP snapshot or inject (model, processor); vocabulary
    defaults to the Omni3D category names."""

    def __init__(self, model_path: str | None = None, model=None, processor=None,
                 vocabulary: list[str] | None = None):
        if model is None:
            from transformers import CLIPModel, CLIPProcessor

            model = CLIPModel.from_pretrained(model_path)
            processor = CLIPProcessor.from_pretrained(model_path)
        self.model = model.eval()
        self.processor = processor
        if vocabulary is None:
            from labelany3d_tpu.data.categories import OMNI3D_CATEGORIES

            vocabulary = [c["name"] for c in OMNI3D_CATEGORIES]
        self.vocabulary = list(vocabulary)

    def tag(self, image: np.ndarray, masks: np.ndarray) -> list[str]:
        import torch
        from PIL import Image

        img = np.asarray(image, np.uint8)
        crops = []
        for m in np.asarray(masks, bool):
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                crops.append(Image.fromarray(img))
                continue
            crops.append(Image.fromarray(
                img[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
            ))
        if not crops:
            return []
        prompts = [f"a photo of a {name}" for name in self.vocabulary]
        inputs = self.processor(
            text=prompts, images=crops, padding="max_length",
            return_tensors="pt", truncation=True,
        )
        with torch.no_grad():
            sims = self.model(**inputs).logits_per_image  # (I, V)
        best = sims.argmax(dim=-1).numpy()
        return [self.vocabulary[int(i)] for i in best]


def default_wild_source() -> WildInstanceSource:
    return WildInstanceSource(ColorSegmentation(), BorderPriorForeground(), ConstantTagger())


def make_wild_source(
    foreground: str = "border",
    tagger: str = "constant",
    segmentation: str = "color",
    clipseg_path: str | None = None,
    clip_path: str | None = None,
    sam_path: str | None = None,
    segformer_path: str | None = None,
) -> WildInstanceSource:
    """Config-driven wild stack (CLI keys run.wild_segmentation /
    run.wild_foreground / run.wild_tagger; model paths under models.*)."""
    if segmentation in ("sam", "entityv2"):  # 'entityv2' = the reference's
        # config name for the class-agnostic segmenter role; served by SAM.
        params = None
        if sam_path is not None:
            import torch

            from labelany3d_tpu.models.sam import SamConfig, convert_sam

            state = torch.load(sam_path, map_location="cpu", weights_only=True)
            params = convert_sam(
                {k: v.numpy() for k, v in state.items()}, SamConfig.vit_base()
            )
        seg = SamSegmentation(params=params)
    elif segmentation == "color":
        seg = ColorSegmentation()
    else:
        raise ValueError(f"Unknown run.wild_segmentation: {segmentation!r} "
                         "(expected 'color', 'sam' or 'entityv2')")
    if foreground == "border":
        fg = BorderPriorForeground()
    elif foreground == "clipseg":
        if clipseg_path is None:
            raise ValueError("run.wild_foreground=clipseg needs models.clipseg_path")
        fg = ClipSegForeground(model_path=clipseg_path)
    elif foreground in ("semantic", "oneformer"):  # the reference's
        # ADE20K thing/stuff filter role, served by the SegFormer graph.
        from labelany3d_tpu.models.segformer import (
            SegFormerConfig,
            SegformerForeground,
            convert_segformer,
        )

        params = id2label = None
        if segformer_path is not None:
            import torch

            state = torch.load(segformer_path, map_location="cpu",
                               weights_only=True)
            params = convert_segformer(
                {k: v.numpy() for k, v in state.items()}, SegFormerConfig.b0()
            )
            # HF snapshots ship id2label in config.json next to the weights;
            # fall back to the shipped ADE20K-150 mapping otherwise
            # (SegformerForeground does that internally when id2label=None).
            import json
            import os

            cfg_json = os.path.join(os.path.dirname(segformer_path), "config.json")
            if os.path.isfile(cfg_json):
                with open(cfg_json) as f:
                    raw = json.load(f).get("id2label")
                if raw:
                    id2label = {int(k): v for k, v in raw.items()}
        fg = SegformerForeground(params=params, id2label=id2label)
    else:
        raise ValueError(f"Unknown run.wild_foreground: {foreground!r} "
                         "(expected 'border', 'clipseg' or 'semantic')")
    if tagger == "constant":
        tg = ConstantTagger()
    elif tagger == "clip":
        if clip_path is None:
            raise ValueError("run.wild_tagger=clip needs models.clip_path")
        tg = ClipTagger(model_path=clip_path)
    else:
        raise ValueError(f"Unknown run.wild_tagger: {tagger!r} "
                         "(expected 'constant' or 'clip')")
    return WildInstanceSource(seg, fg, tg)
