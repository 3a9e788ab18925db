"""COCO3D label-set comparison: mean 3D IoU between two Omni3D JSONs.

The BASELINE protocol scores our pseudo-labels against the reference's
(`uva-cv-lab/COCO3D`) by mean oriented 3D IoU. This tool matches
annotations across two COCO3D files (by image file_path, then Hungarian on
2D tight boxes within the image) and scores matched pairs with the
stratified-grid oriented IoU (`export.iou3d`).

CLI:  python -m labelany3d_tpu.export.evaluate ours.json theirs.json
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np

from labelany3d_tpu.export.hungarian import hungarian_match
from labelany3d_tpu.export.iou3d import box3d_iou


def _index_by_image(data: dict) -> dict:
    images = {img["id"]: img for img in data["images"]}
    per_image = defaultdict(list)
    for anno in data["annotations"]:
        img = images.get(anno["image_id"])
        if img is None:
            continue
        per_image[img["file_path"]].append(anno)
    return per_image


def compare_coco3d(ours: dict, theirs: dict, grid: int = 32) -> dict:
    """Match + score two loaded COCO3D dicts; returns summary stats."""
    import jax
    import jax.numpy as jnp

    iou_fn = jax.jit(box3d_iou, static_argnames=("grid",))

    ours_ix = _index_by_image(ours)
    theirs_ix = _index_by_image(theirs)
    shared = sorted(set(ours_ix) & set(theirs_ix))

    ious: list[float] = []
    matched = 0
    total_ours = sum(len(v) for v in ours_ix.values())
    total_theirs = sum(len(v) for v in theirs_ix.values())
    for fp in shared:
        a_list = ours_ix[fp]
        b_list = theirs_ix[fp]
        boxes_a = np.asarray([a.get("bbox2D_tight", a["bbox2D_trunc"]) for a in a_list], float)
        boxes_b = np.asarray([b.get("bbox2D_tight", b["bbox2D_trunc"]) for b in b_list], float)
        pairs = hungarian_match(boxes_a, boxes_b)
        for i, j, iou2d in pairs:
            if iou2d < 0.25:
                continue  # not the same object
            ca = jnp.asarray(a_list[i]["bbox3D_cam"], jnp.float32)
            cb = jnp.asarray(b_list[j]["bbox3D_cam"], jnp.float32)
            ious.append(float(iou_fn(ca, cb, grid=grid)))
            matched += 1

    return {
        "images_shared": len(shared),
        "annotations_ours": total_ours,
        "annotations_theirs": total_theirs,
        "matched_pairs": matched,
        "mean_iou3d": float(np.mean(ious)) if ious else 0.0,
        "median_iou3d": float(np.median(ious)) if ious else 0.0,
        "iou3d_ge_0.5": float(np.mean(np.asarray(ious) >= 0.5)) if ious else 0.0,
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Compare two COCO3D JSONs by 3D IoU")
    p.add_argument("ours")
    p.add_argument("theirs")
    p.add_argument("--grid", type=int, default=32)
    args = p.parse_args(argv)
    with open(args.ours) as f:
        ours = json.load(f)
    with open(args.theirs) as f:
        theirs = json.load(f)
    print(json.dumps(compare_coco3d(ours, theirs, args.grid), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
