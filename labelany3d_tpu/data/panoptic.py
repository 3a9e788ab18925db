"""Panoptic -> instance annotation conversion (download_coconut equivalent).

Parity target: `src/download_coconut.py:160-332` in the reference repo —
the COCONUT panoptic datasets (HF `xdeng77/{relabeled_coco_val, coconut_s,
coconut_b}`) ship RGB-encoded panoptic id masks + segments_info; the
pipeline needs instance-format JSON (`coconut_{split}.json`).

Conversion logic is the reference's (RGB -> id = r + g*256 + b*65536,
thing-only filter, per-segment RLE encode, XYWH bboxes) using our own RLE
codec instead of pycocotools; the HF download wrapper only runs when the
`datasets` hub is reachable, while `convert_panoptic_item` is pure and
testable offline.
"""

from __future__ import annotations

import json
import os

import numpy as np

from labelany3d_tpu.data.rle import rle_encode

OUTPUT_FILENAMES = {
    "relabeled_coco_val": "coconut_val.json",
    "coconut_s": "coconut_train.json",
    "coconut_b": "coconut_train_b.json",
}


def panoptic_rgb_to_ids(panoptic_mask: np.ndarray) -> np.ndarray:
    """RGB-encoded panoptic PNG -> int32 segment-id map.

    Parity: `download_coconut.py:244-249` (id = r + g*256 + b*65536).
    """
    m = np.asarray(panoptic_mask)
    if m.ndim == 3:
        return (
            m[:, :, 0].astype(np.int32)
            + m[:, :, 1].astype(np.int32) * 256
            + m[:, :, 2].astype(np.int32) * 65536
        )
    return m.astype(np.int32)


def convert_panoptic_item(
    panoptic_mask: np.ndarray,
    segments_info: list[dict],
    image_id: int,
    start_annotation_id: int = 0,
    compress_rle: bool = True,
) -> list[dict]:
    """One panoptic image -> COCO-instance annotations (things only)."""
    ids = panoptic_rgb_to_ids(panoptic_mask)
    annotations = []
    anno_id = start_annotation_id
    for seg in segments_info:
        if not seg.get("isthing", 0):
            continue  # thing-only parity (download_coconut.py:255-257)
        anno_id += 1
        mask = ids == seg["id"]
        area = int(mask.sum())
        if area == 0:
            continue
        rows = np.any(mask, axis=1)
        cols = np.any(mask, axis=0)
        y0, y1 = np.flatnonzero(rows)[[0, -1]]
        x0, x1 = np.flatnonzero(cols)[[0, -1]]
        rle = rle_encode(mask, compress=compress_rle)
        counts = rle["counts"]
        if isinstance(counts, bytes):
            counts = counts.decode()
        annotations.append(
            {
                "id": anno_id,
                "image_id": int(image_id),
                "category_id": int(seg.get("category_id", 0)),
                "iscrowd": int(seg.get("iscrowd", 0)),
                "area": area,
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "segmentation": {"size": rle["size"], "counts": counts},
            }
        )
    return annotations


def download_coconut(split: str, output_dir: str) -> str:
    """HF download + conversion wrapper (needs network; logic above is pure).

    Parity: `download_coconut.py:204-332`.
    """
    if split not in OUTPUT_FILENAMES:
        raise ValueError(f"Unknown split: {split}. Choose from {list(OUTPUT_FILENAMES)}")
    from datasets import load_dataset

    os.makedirs(output_dir, exist_ok=True)
    dataset = load_dataset(f"xdeng77/{split}")
    images, annotations = [], []
    anno_id = 0
    for item in dataset["train"]:
        info = item["segments_info"]
        mask = np.asarray(item["mask"])
        image_id = info["image_id"]
        new = convert_panoptic_item(mask, info["segments_info"], image_id, anno_id)
        anno_id += len(new)
        annotations.extend(new)
        images.append(
            {
                "id": int(image_id),
                "file_name": info.get("file_name", f"{image_id:012d}.jpg"),
                "height": int(mask.shape[0]),
                "width": int(mask.shape[1]),
            }
        )
    out_path = os.path.join(output_dir, OUTPUT_FILENAMES[split])
    with open(out_path, "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": []}, f)
    return out_path
