"""Data layer (RLE codec, loaders) and export (Hungarian, Omni3D) tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from labelany3d_tpu.data import (
    CATEGORY_NAME_TO_OMNI3D_ID,
    COCO_CATEGORIES,
    CoconutLoader,
    OMNI3D_CATEGORIES,
    category_names,
    decode_annotation_mask,
    mask_to_rle,
    read_instances,
    rle_decode,
    rle_encode,
    rle_from_string,
    rle_to_mask,
    rle_to_string,
)
from labelany3d_tpu.data.coconut import xywh_to_xyxy
from labelany3d_tpu.export import (
    auction_assignment,
    combine_results,
    hungarian_match,
    iou2d_matrix,
    project_corners_to_2d_box,
    scene_to_omni3d,
)


# ---------------------------------------------------------------- RLE codec

def test_rle_mask_roundtrip(rng):
    for shape in [(13, 7), (32, 32), (1, 5)]:
        m = rng.uniform(size=shape) > 0.6
        counts = mask_to_rle(m)
        back = rle_to_mask(counts, *shape)
        assert (back == m).all()


def test_rle_string_roundtrip(rng):
    m = rng.uniform(size=(25, 31)) > 0.5
    counts = mask_to_rle(m)
    s = rle_to_string(counts)
    counts2 = rle_from_string(s)
    np.testing.assert_array_equal(counts, counts2)


def test_rle_encode_decode_dict(rng):
    m = rng.uniform(size=(40, 50)) > 0.7
    rle = rle_encode(m)
    assert rle["size"] == [40, 50]
    assert isinstance(rle["counts"], bytes)
    assert (rle_decode(rle) == m).all()
    # uncompressed path
    rle_u = rle_encode(m, compress=False)
    assert (rle_decode(rle_u) == m).all()


def test_rle_known_vector():
    # 3x3 mask, column-major: col0 = [0,1,1], col1 = [1,0,0], col2=[0,0,1]
    m = np.array([[0, 1, 0], [1, 0, 0], [1, 0, 1]], bool)
    counts = mask_to_rle(m)
    np.testing.assert_array_equal(counts, [1, 3, 4, 1])


def test_rle_string_negative_delta():
    # Deltas between counts can be negative; exercise sign extension.
    counts = np.array([100, 3, 2, 50, 1], np.int64)
    s = rle_to_string(counts)
    np.testing.assert_array_equal(rle_from_string(s), counts)


# ------------------------------------------------------------- loaders

def _toy_coconut(tmp_path, h=64, w=80):
    m = np.zeros((h, w), bool)
    m[20:50, 30:60] = True
    rle = rle_encode(m)
    anno = {
        "image_id": 1,
        "category_id": 62,  # chair
        "iscrowd": 0,
        "bbox": [30, 20, 30, 30],
        "segmentation": {"size": rle["size"], "counts": rle["counts"].decode()},
    }
    small = np.zeros((h, w), bool)
    small[30:32, 40:42] = True
    rle_small = rle_encode(small)
    anno_small = {
        "image_id": 1,
        "category_id": 47,
        "iscrowd": 0,
        "bbox": [40, 30, 2, 2],
        "segmentation": {"size": rle_small["size"], "counts": rle_small["counts"].decode()},
    }
    crowd = dict(anno, iscrowd=1)
    data = {
        "images": [{"id": 1, "file_name": "000000000001.jpg", "height": h, "width": w}],
        "annotations": [anno, anno_small, crowd],
        "categories": [],
    }
    p = tmp_path / "annotations"
    p.mkdir()
    (p / "coconut_val.json").write_text(json.dumps(data))
    return str(p), m


def test_coconut_loader_and_read_instances(tmp_path):
    annotations_dir, m = _toy_coconut(tmp_path)
    loader = CoconutLoader(split="val", annotations_dir=annotations_dir)
    assert len(loader) == 1
    info = loader.get_image_by_index(0)
    annos = loader.get_annotations(info["id"])
    assert len(annos) == 3
    inst = read_instances(annos, (info["width"], info["height"]))
    # big chair kept; tiny cup and crowd dropped
    assert len(inst) == 1
    assert inst.labels == ["chair"]
    assert (inst.masks[0] == m).all()


def test_polygon_decode():
    anno = {"segmentation": [[10, 10, 30, 10, 30, 25, 10, 25]]}
    mask = decode_annotation_mask(anno, (64, 48))
    assert mask.shape == (48, 64)
    assert mask[15, 20] and not mask[5, 5]
    area = mask.sum()
    assert 250 <= area <= 340  # ~20x15 rectangle


def test_xywh_to_xyxy():
    out = xywh_to_xyxy(np.array([[10, 20, 30, 40]]))
    np.testing.assert_array_equal(out, [[10, 20, 40, 60]])


def test_category_tables():
    assert COCO_CATEGORIES[62] == "chair"
    assert category_names([62, 9999]) == ["chair", "unknown"]
    assert CATEGORY_NAME_TO_OMNI3D_ID["car"] == 1
    assert CATEGORY_NAME_TO_OMNI3D_ID["toothbrush"] == 153
    assert len(OMNI3D_CATEGORIES) == 80


# ------------------------------------------------------------- matching

def test_iou2d_matrix():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(iou2d_matrix(a, b))[0]
    assert iou[0] == pytest.approx(1.0, abs=1e-5)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-4)
    assert iou[2] == pytest.approx(0.0, abs=1e-6)


def test_hungarian_match_identity():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 55, 55]], float)
    shuffled = boxes[[2, 0, 1]]
    matches = hungarian_match(boxes, shuffled)
    assign = {i: j for i, j, _ in matches}
    assert assign == {0: 1, 1: 2, 2: 0}


def test_auction_matches_hungarian(rng):
    for _ in range(5):
        n, m = 6, 9
        benefit = rng.uniform(size=(n, m)).astype(np.float32)
        ours = np.asarray(auction_assignment(jnp.asarray(benefit), eps=1e-5))
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(-benefit)
        total_ref = benefit[rows, cols].sum()
        assert (ours >= 0).all()
        assert len(set(ours.tolist())) == n  # valid permutation
        total_ours = benefit[np.arange(n), ours].sum()
        assert total_ours >= total_ref - n * 1e-4


def test_auction_with_padding(rng):
    benefit = rng.uniform(size=(5, 7)).astype(np.float32)
    row_valid = jnp.array([True, True, True, False, False])
    out = np.asarray(auction_assignment(jnp.asarray(benefit), row_valid=row_valid))
    assert (out[3:] == -1).all()
    assert (out[:3] >= 0).all()


def test_auction_invalid_columns(rng):
    """A row whose every valid column is taken (valid rows > valid cols)
    must return -1, never an invalid column index."""
    benefit = rng.uniform(size=(4, 6)).astype(np.float32)
    col_valid = jnp.array([True, True, False, False, False, False])
    out = np.asarray(
        auction_assignment(jnp.asarray(benefit), col_valid=col_valid)
    )
    assigned = out[out >= 0]
    assert len(assigned) <= 2
    assert set(assigned.tolist()) <= {0, 1}
    assert (out == -1).sum() >= 2


# ------------------------------------------------------------- omni3d export

def _toy_scene_artifacts():
    K = [[500.0, 0.0, 64.0], [0.0, 500.0, 48.0], [0.0, 0.0, 1.0]]
    cam_params = {"K": K, "H": 96, "W": 128, "c2w": np.eye(4).tolist()}
    corners = (np.array([
        [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
        [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
    ]) + np.array([0.0, 0.0, 4.0])).tolist()
    bbox_list = [
        {
            "obj_id": "0",
            "category_name": "chair",
            "center_cam": [0.0, 0.0, 4.0],
            "R_cam": np.eye(3).tolist(),
            "dimensions": [1.0, 1.0, 1.0],
            "bbox3D_cam": corners,
        },
        {"obj_id": "1", "category_name": "not a thing", "bbox3D_cam": corners},
    ]
    return cam_params, bbox_list


def test_scene_to_omni3d():
    cam_params, bbox_list = _toy_scene_artifacts()
    img, annos = scene_to_omni3d(
        "000000000001", cam_params, bbox_list, [[10, 10, 100, 80]],
        "val", 1000000, 100000000, 22,
    )
    assert img["id"] == 1000000 and img["dataset_id"] == 22
    assert len(annos) == 1  # unknown category dropped
    a = annos[0]
    assert a["category_id"] == CATEGORY_NAME_TO_OMNI3D_ID["chair"]
    # Projected box geometry: center pixel +- 500*0.5/z range
    proj = a["bbox2D_proj"]
    assert proj[0] < 64 < proj[2] and proj[1] < 48 < proj[3]
    assert a["bbox2D_tight"] == [10, 10, 100, 80]
    assert a["id"] == 100000000


def test_scene_to_omni3d_all_unknown_categories_keeps_image():
    """Reference parity (`combine_results.py`): the image entry is emitted
    (and image_id advances) whenever 3dbbox.json is non-empty, even if every
    annotation is dropped for unknown category — keeps ids aligned."""
    cam_params, bbox_list = _toy_scene_artifacts()
    only_unknown = [b for b in bbox_list if b["category_name"] != "chair"]
    img, annos = scene_to_omni3d(
        "000000000002", cam_params, only_unknown, None,
        "val", 1000001, 100000001, 22,
    )
    assert img is not None and img["id"] == 1000001
    assert annos == []
    # empty 3dbbox.json still skips the scene entirely
    img, annos = scene_to_omni3d(
        "000000000003", cam_params, [], None, "val", 1000002, 100000002, 22,
    )
    assert img is None and annos == []


def test_scene_to_omni3d_tight_fallback_flag():
    """tight_fallback=False reproduces the reference exactly
    (combine_results.py:278-286, verified against the loaded module in
    test_parity_export.py): when matching never ran (no 2D boxes), the
    reference ITSELF falls back to tight = trunc for every annotation;
    the missing key appears only for Hungarian match LOSERS."""
    cam_params, bbox_list = _toy_scene_artifacts()
    img, annos = scene_to_omni3d(
        "000000000001", cam_params, bbox_list, None,
        "val", 1000000, 100000000, 22, tight_fallback=False,
    )
    assert img is not None and len(annos) == 1
    assert annos[0]["bbox2D_tight"] == annos[0]["bbox2D_trunc"]
    # Two annotations, one 2D box: the loser keeps a missing key.
    two = bbox_list + [dict(bbox_list[0], obj_id="9")]
    img, annos = scene_to_omni3d(
        "000000000001", cam_params, two, [[10.0, 10.0, 100.0, 80.0]],
        "val", 1000000, 100000000, 22, tight_fallback=False,
    )
    assert len(annos) == 2
    assert sum("bbox2D_tight" in a for a in annos) == 1


def test_combine_results_directory_contract(tmp_path):
    cam_params, bbox_list = _toy_scene_artifacts()
    scene_dir = tmp_path / "val" / "000000000001"
    scene_dir.mkdir(parents=True)
    (scene_dir / "cam_params.json").write_text(json.dumps(cam_params))
    (scene_dir / "3dbbox.json").write_text(json.dumps(bbox_list))
    (scene_dir / "bboxes.json").write_text(json.dumps([[10, 10, 100, 80]]))
    # a scene with missing files is skipped
    (tmp_path / "val" / "000000000002").mkdir()

    out_path = tmp_path / "COCO3D_val.json"
    out = combine_results(str(tmp_path), "val", str(out_path))
    assert len(out["images"]) == 1
    assert len(out["annotations"]) == 1
    assert out["info"]["id"] == 22
    assert out["categories"] == OMNI3D_CATEGORIES
    saved = json.loads(out_path.read_text())
    assert saved["images"][0]["file_path"] == "coco/images/val2017/000000000001.jpg"


def test_project_corners_clamping():
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    corners = np.array([[-5.0, -5.0, 2.0]] * 8)
    proj, trunc = project_corners_to_2d_box(corners, K, 100, 100)
    assert proj[0] < 0 and trunc[0] == 0.0
