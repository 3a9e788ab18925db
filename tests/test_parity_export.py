"""Stage-8 export parity against the reference's ACTUAL module.

`/root/reference/src/tools/combine_results.py` imports only
numpy/scipy/tqdm (:9-14), so it is directly importable — no stubs. Both
exporters run over the SAME scene directories and the resulting Omni3D
JSONs are asserted structurally EQUAL (category table, image entries, id
offsets, every annotation field including bbox2D_proj/trunc/tight floats).
Float handling: both sides compute the 2D projections in float64 and
serialize via json.dump; equality here is exact (`==` on parsed floats),
not approximate.

Covered directory shapes (combine_results.py:147-311):
  * multi-object scene with bboxes.json (Hungarian-matched tight boxes),
  * underscore category names ("potted_plant" -> "potted plant"),
  * corners out of image bounds (proj vs trunc clamping),
  * unknown-category annotation dropped but image entry kept,
  * empty 3dbbox.json scene skipped entirely,
  * scene without bboxes.json (reference falls back tight = trunc),
  * more annotations than 2D boxes (match losers keep a MISSING
    bbox2D_tight key in the reference; tight_fallback=False reproduces it).
"""

import json
import os

import numpy as np
import pytest

from labelany3d_tpu.export.omni3d import combine_results
from tests.reference_loader import load_reference_combine_results

REF_CR = load_reference_combine_results()


def _box_dict(center, dims, yaw, name, obj_id):
    """A well-formed 3dbbox.json entry (src/util_3dbox.py:282-289 fields)."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    r = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    dz, dy, dx = dims
    half = np.array([dx, dy, dz]) / 2.0
    signs = np.array([[sx, sy_, sz] for sx in (-1, 1) for sy_ in (-1, 1) for sz in (-1, 1)],
                     np.float64)
    corners = (signs * half) @ r.T + np.asarray(center)
    return {
        "obj_id": obj_id,
        "category_name": name,
        "center_cam": list(map(float, center)),
        "R_cam": r.tolist(),
        "dimensions": list(map(float, dims)),
        "bbox3D_cam": corners.tolist(),
    }


@pytest.fixture()
def scene_tree(tmp_path):
    root = tmp_path / "results"
    K = [[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]]
    cam = {"K": K, "H": 192, "W": 256}

    def scene(name, boxes, boxes2d=None):
        d = root / "val" / name
        d.mkdir(parents=True)
        (d / "cam_params.json").write_text(json.dumps(cam))
        (d / "3dbbox.json").write_text(json.dumps(boxes))
        if boxes2d is not None:
            (d / "bboxes.json").write_text(json.dumps(boxes2d))

    # Scene 1: two objects, 2D boxes present -> Hungarian-matched tight.
    scene(
        "000000000001",
        [
            _box_dict((0.2, 0.1, 3.0), (0.8, 1.2, 0.6), 0.4, "chair", "0"),
            _box_dict((-0.8, 0.0, 4.5), (0.5, 0.5, 0.5), -0.2, "potted_plant", "1"),
        ],
        boxes2d=[[10.0, 20.0, 120.0, 180.0], [130.0, 40.0, 240.0, 150.0]],
    )
    # Scene 2: unknown category dropped, image entry still emitted; a corner
    # set far off-frame exercises the trunc clamping on the kept chair.
    scene(
        "000000000002",
        [
            _box_dict((0.0, 0.0, 2.0), (5.0, 5.0, 5.0), 0.0, "chair", "0"),
            _box_dict((0.0, 0.0, 3.0), (1.0, 1.0, 1.0), 0.0, "not_a_category", "1"),
        ],
        boxes2d=[[0.0, 0.0, 250.0, 190.0]],
    )
    # Scene 3: empty 3dbbox.json -> skipped, ids do NOT advance.
    scene("000000000003", [])
    # Scene 4: no bboxes.json -> reference sets tight = trunc for all.
    scene("000000000004", [_box_dict((0.5, -0.3, 6.0), (1.0, 2.0, 0.7), 1.1, "tv", "0")])
    # Scene 5: 2 annotations, 1 2D box -> one match LOSER keeps a missing
    # bbox2D_tight key in the reference output.
    scene(
        "000000000005",
        [
            _box_dict((0.0, 0.0, 3.0), (0.6, 0.6, 0.6), 0.0, "cup", "0"),
            _box_dict((1.0, 0.2, 5.0), (0.4, 0.9, 0.4), 0.3, "bottle", "1"),
        ],
        boxes2d=[[100.0, 60.0, 160.0, 130.0]],
    )
    return str(root)


def test_export_matches_reference_module(scene_tree, tmp_path):
    ref_out_path = str(tmp_path / "ref.json")
    REF_CR.combine_coco_results(scene_tree, "val", ref_out_path)
    with open(ref_out_path) as f:
        ref = json.load(f)

    ours_path = str(tmp_path / "ours.json")
    # tight_fallback=False is plumbed through combine_results by patching
    # scene_to_omni3d's default here would hide the production path; instead
    # assert the production (fallback=True) output equals the reference
    # everywhere EXCEPT the documented extra bbox2D_tight key, then check
    # the exact-parity path separately below.
    ours = combine_results(scene_tree, "val", ours_path)
    with open(ours_path) as f:
        ours_json = json.load(f)
    assert ours_json == json.loads(json.dumps(ours))  # file == return value

    assert ours["info"] == ref["info"]
    assert ours["categories"] == ref["categories"]
    assert ours["images"] == ref["images"]
    assert len(ours["annotations"]) == len(ref["annotations"])
    extra_tight = 0
    for a_ours, a_ref in zip(ours["annotations"], ref["annotations"]):
        a_ours = dict(a_ours)
        if "bbox2D_tight" in a_ours and "bbox2D_tight" not in a_ref:
            a_ours.pop("bbox2D_tight")  # documented robustness addition
            extra_tight += 1
        assert a_ours == a_ref
    # Exactly the scene-5 match loser differs.
    assert extra_tight == 1


def test_export_exact_parity_flag(scene_tree, tmp_path, monkeypatch):
    """With tight_fallback=False the outputs are EQUAL, key-for-key."""
    import labelany3d_tpu.export.omni3d as omni3d

    ref_out_path = str(tmp_path / "ref.json")
    REF_CR.combine_coco_results(scene_tree, "val", ref_out_path)
    with open(ref_out_path) as f:
        ref = json.load(f)

    orig = omni3d.scene_to_omni3d
    monkeypatch.setattr(
        omni3d, "scene_to_omni3d",
        lambda *a, **kw: orig(*a, **{**kw, "tight_fallback": False}),
    )
    ours = json.loads(json.dumps(omni3d.combine_results(scene_tree, "val")))
    assert ours == ref


def test_export_id_offsets_vs_reference_train_split(scene_tree, tmp_path):
    """Train-split ids (dataset 23, 2e6/2e8 offsets) also match the
    reference when the same tree is read as 'train'."""
    train_root = str(tmp_path / "train_results")
    os.makedirs(train_root)
    os.rename(os.path.join(scene_tree, "val"), os.path.join(train_root, "train"))
    ref_out = str(tmp_path / "ref_train.json")
    REF_CR.combine_coco_results(train_root, "train", ref_out)
    with open(ref_out) as f:
        ref = json.load(f)
    ours = json.loads(json.dumps(combine_results(train_root, "train")))
    assert ours["info"] == ref["info"]
    assert ours["images"] == ref["images"]
    assert [a["id"] for a in ours["annotations"]] == [a["id"] for a in ref["annotations"]]
    assert ours["images"][0]["id"] == 2000000
    assert ours["annotations"][0]["id"] == 200000000
