"""Aggregation & export: Omni3D-format COCO3D JSON, Hungarian matching.

Replaces reference layer L6 (`src/tools/combine_results.py`).
"""

from labelany3d_tpu.export.hungarian import hungarian_match, iou2d_matrix, auction_assignment
from labelany3d_tpu.export.omni3d import (
    scene_to_omni3d,
    combine_results,
    project_corners_to_2d_box,
)

__all__ = [
    "hungarian_match", "iou2d_matrix", "auction_assignment",
    "scene_to_omni3d", "combine_results", "project_corners_to_2d_box",
]
