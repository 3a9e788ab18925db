"""Fake model backends for hermetic pipeline tests.

The reference has no tests; its de-facto verification is visual (SURVEY.md
§4). Our test strategy replaces every heavyweight model with a geometric
fake whose output is *analytically known*, so the end-to-end pipeline can be
asserted numerically on CPU: a synthetic room scene with planar depth yields
boxes whose dimensions/centers are computable in closed form.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FakeScene:
    """Ground-truth generator: a fronto-parallel wall + floor + box objects.

    Produces (image, depth, K) plus instance masks whose 3D extents are
    known, for testing the depth -> instances -> boxfit -> export path.
    """

    width: int = 128
    height: int = 96
    fx: float = 120.0
    fy: float = 120.0

    def intrinsics(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.width / 2], [0, self.fy, self.height / 2], [0, 0, 1]],
            np.float64,
        )

    def make(self, objects: list[dict]):
        """objects: [{'z': depth, 'rect': (x0, y0, x1, y1) pixel rect}].

        Returns (image uint8 HxWx3, depth HxW, masks IxHxW, gt boxes).
        Each object is a fronto-parallel rectangle at constant depth z, so
        its true 3D extent is ((x1-x0)/fx*z, (y1-y0)/fy*z, 0) and its center
        back-projects from the rect center.
        """
        depth = np.full((self.height, self.width), 8.0)
        img = np.full((self.height, self.width, 3), 127, np.uint8)
        masks, gts = [], []
        K = self.intrinsics()
        for i, obj in enumerate(objects):
            x0, y0, x1, y1 = obj["rect"]
            z = obj["z"]
            mask = np.zeros((self.height, self.width), bool)
            mask[y0:y1, x0:x1] = True
            depth[mask] = z
            img[mask] = (40 * (i + 1)) % 255
            masks.append(mask)
            cx = (x0 + x1 - 1) / 2
            cy = (y0 + y1 - 1) / 2
            center = np.linalg.inv(K) @ np.array([cx * z, cy * z, z])
            gts.append(
                {
                    "center": center,
                    "extent_x": (x1 - 1 - x0) / self.fx * z,
                    "extent_y": (y1 - 1 - y0) / self.fy * z,
                    "z": z,
                }
            )
        return img, depth, np.stack(masks) if masks else np.zeros((0, self.height, self.width), bool), gts


class FakeMoGe:
    """Drop-in for the MoGe backend: returns scaled depth (affine-invariant)
    plus intrinsics, driven by a FakeScene depth map supplied per call."""

    def __init__(self, scale: float = 0.5):
        self.scale = scale

    def infer(self, image: np.ndarray, true_depth: np.ndarray, K: np.ndarray):
        rel = true_depth * self.scale  # affine-invariant: scaled metric depth
        mask = np.ones_like(rel, bool)
        return {"depth": rel, "mask": mask, "intrinsics": K}


class FakeDepthPro:
    """Drop-in for the DepthPro backend: returns the true metric depth."""

    def infer(self, image: np.ndarray, true_depth: np.ndarray, f_px: float):
        return {"depth": true_depth}
