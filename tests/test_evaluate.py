"""COCO3D comparison tool test."""

import numpy as np

from labelany3d_tpu.export.evaluate import compare_coco3d
from labelany3d_tpu.geometry import convert_box_vertices
import jax.numpy as jnp


def _coco3d(boxes_by_image):
    images, annotations = [], []
    img_id, anno_id = 1000000, 100000000
    for fp, boxes in boxes_by_image.items():
        images.append({"id": img_id, "file_path": fp, "width": 100, "height": 100})
        for center, dims, yaw, tight in boxes:
            corners = np.asarray(convert_box_vertices(jnp.asarray(center), jnp.asarray(dims), yaw))
            annotations.append({
                "image_id": img_id, "id": anno_id,
                "bbox3D_cam": corners.tolist(),
                "bbox2D_trunc": tight, "bbox2D_tight": tight,
            })
            anno_id += 1
        img_id += 1
    return {"images": images, "annotations": annotations}


def test_compare_identical_sets():
    boxes = {
        "img/a.jpg": [([0, 0, 4], [1, 1, 1], 0.2, [10, 10, 30, 30]),
                      ([2, 0, 6], [2, 1, 1], 0.0, [50, 50, 80, 80])],
        "img/b.jpg": [([0, 1, 5], [1, 2, 1], 0.5, [20, 20, 60, 60])],
    }
    a = _coco3d(boxes)
    b = _coco3d(boxes)
    out = compare_coco3d(a, b, grid=40)
    assert out["images_shared"] == 2
    assert out["matched_pairs"] == 3
    assert out["mean_iou3d"] > 0.95
    assert out["iou3d_ge_0.5"] == 1.0


def test_compare_perturbed_and_missing():
    base = {
        "img/a.jpg": [([0, 0, 4], [1, 1, 1], 0.2, [10, 10, 30, 30])],
        "img/b.jpg": [([0, 1, 5], [1, 2, 1], 0.5, [20, 20, 60, 60])],
    }
    moved = {
        "img/a.jpg": [([0.4, 0, 4], [1, 1, 1], 0.2, [12, 10, 32, 30])],  # shifted
        "img/c.jpg": [([9, 9, 9], [1, 1, 1], 0.0, [0, 0, 5, 5])],        # only ours
    }
    out = compare_coco3d(_coco3d(moved), _coco3d(base), grid=40)
    assert out["images_shared"] == 1
    assert out["matched_pairs"] == 1
    assert 0.2 < out["mean_iou3d"] < 0.75  # 0.4 shift on a unit box
