"""Shared stage plumbing: image sources, resizing, batching."""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np


class ImageSource(Protocol):
    def get(self, image_info: dict) -> np.ndarray:
        """Return (H, W, 3) uint8 RGB for an images[] entry."""
        ...


class FileImageSource:
    """Reads `images_root/<file_name>` (the reference's layout)."""

    def __init__(self, images_root: str):
        self.images_root = images_root

    def get(self, image_info: dict) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.images_root, image_info["file_name"])
        return np.asarray(Image.open(path).convert("RGB"))


class ArrayImageSource:
    """In-memory source keyed by image id (tests / synthetic scenes)."""

    def __init__(self, images_by_id: dict[int, np.ndarray]):
        self.images_by_id = images_by_id

    def get(self, image_info: dict) -> np.ndarray:
        return self.images_by_id[image_info["id"]]


def resize_image(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear uint8 image resize on host (PIL, antialiased)."""
    from PIL import Image

    if img.shape[0] == height and img.shape[1] == width:
        return img
    return np.asarray(Image.fromarray(img).resize((width, height), Image.BILINEAR))


def resize_nearest(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest resize for depth maps / masks (no value mixing across the
    invalid-depth sentinel or mask boundaries)."""
    h, w = arr.shape[-2], arr.shape[-1]
    if h == height and w == width:
        return arr
    ys = np.floor(np.arange(height) * (h / height)).astype(np.int64)
    xs = np.floor(np.arange(width) * (w / width)).astype(np.int64)
    return arr[..., ys[:, None], xs[None, :]]


def pad_instances(masks: np.ndarray, max_instances: int) -> tuple[np.ndarray, np.ndarray]:
    """(I, H, W) -> ((max_I, H, W), keep flags). Overflow instances drop."""
    i, h, w = masks.shape
    out = np.zeros((max_instances, h, w), bool)
    n = min(i, max_instances)
    out[:n] = masks[:n]
    kept = np.zeros(max_instances, bool)
    kept[:n] = True
    return out, kept


def pack_instance_masks(masks: np.ndarray) -> np.ndarray:
    """(I, H, W) bool -> (H, W) bitfield, instance i in bit i.

    Shrinks the host->device transfer of the box stage's padded mask
    stack by I bytes/pixel (16 MB -> 2 MB per 4x16x512^2 batch over the
    axon tunnel); `labeling.unpack_instance_masks` restores the boolean
    stack on device. Requires I <= 32.
    """
    i, h, w = masks.shape
    assert i <= 32, f"bit packing supports <=32 instance slots, got {i}"
    dtype = np.uint8 if i <= 8 else np.uint16 if i <= 16 else np.uint32
    out = np.zeros((h, w), dtype)
    for b in range(i):
        out[masks[b]] |= dtype(1 << b)
    return out
