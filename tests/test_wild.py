"""Wild-mode segmentation front-end tests."""

import numpy as np
import pytest

from labelany3d_tpu.data.wild import (
    BorderPriorForeground,
    ColorSegmentation,
    ConstantTagger,
    WildInstanceSource,
    default_wild_source,
    filter_component_masks,
)


def test_filter_component_masks_parity():
    h, w = 32, 32
    masks = np.zeros((3, h, w), bool)
    masks[0, 5:15, 5:15] = True      # fully inside fg
    masks[1, 20:30, 20:30] = True    # fully outside
    masks[2, 10:20, 10:20] = True    # ~25% overlap
    fg = np.zeros((h, w), bool)
    fg[0:16, 0:16] = True
    keep, drop = filter_component_masks(masks, fg, threshold=0.5)
    assert keep.tolist() == [0]
    assert drop.tolist() == [1, 2]


def _toy_wild_image():
    img = np.full((96, 128, 3), 220, np.uint8)     # bright background
    img[20:70, 20:60] = [200, 30, 30]              # red object
    img[30:80, 80:115] = [30, 30, 200]             # blue object
    return img


def test_color_segmentation_finds_objects():
    img = _toy_wild_image()
    masks = ColorSegmentation(min_area=300).segment(img)
    assert len(masks) >= 3  # two objects + background component(s)
    areas = masks.sum(axis=(1, 2))
    assert (areas >= 300).all()


def test_border_prior_foreground():
    img = _toy_wild_image()
    fg = BorderPriorForeground().foreground(img)
    assert fg[40, 40] and fg[50, 90]     # objects are foreground
    assert not fg[5, 5] and not fg[90, 5]  # borders are background


def test_wild_instance_source_end_to_end():
    img = _toy_wild_image()
    src = default_wild_source()
    inst = src.read_instances(img)
    assert len(inst) >= 2
    assert all(lbl == "object" for lbl in inst.labels)
    # each kept mask is mostly foreground; background plate was dropped
    areas = inst.masks.sum(axis=(1, 2))
    assert areas.max() <= 60 * 50  # no full-image component survives
    # bboxes in XYWH cover the two objects
    assert inst.bboxes.shape[1] == 4


def test_wild_source_empty_image():
    img = np.full((64, 64, 3), 128, np.uint8)
    src = WildInstanceSource(ColorSegmentation(min_area=1 << 20),
                             BorderPriorForeground(), ConstantTagger())
    inst = src.read_instances(img)
    assert len(inst) == 0


def test_sam_segmentation_wild_source():
    """The learned SAM segmenter slots into the wild stack (tiny config,
    random weights: machinery + protocol contract, not mask quality)."""
    import numpy as np

    from labelany3d_tpu.data.wild import (
        BorderPriorForeground,
        ConstantTagger,
        SamSegmentation,
        WildInstanceSource,
    )
    from labelany3d_tpu.models.sam import SamConfig

    seg = SamSegmentation(cfg=SamConfig.tiny_test(), points_per_side=4,
                          pred_iou_thresh=-1e9, min_area_frac=0.0)
    src = WildInstanceSource(seg, BorderPriorForeground(), ConstantTagger(),
                             overlap_threshold=-1.0)  # keep all (random fg)
    rng = np.random.default_rng(0)
    image = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    inst = src.read_instances(image)
    assert inst.masks.shape[1:] == (48, 64)
    assert len(inst.labels) == len(inst.masks) == len(inst.bboxes)
    assert all(label == "object" for label in inst.labels)


def test_make_wild_source_sam_selector():
    from labelany3d_tpu.data.wild import SamSegmentation, make_wild_source

    src = make_wild_source(segmentation="entityv2")
    assert isinstance(src.segmentation, SamSegmentation)
    import pytest

    with pytest.raises(ValueError, match="wild_segmentation"):
        make_wild_source(segmentation="nope")


def _photo_like_fixture():
    """Procedural 'photograph': vignette-lit textured room with three
    shaded, noise-textured objects at known locations. Unlike the flat
    color blobs above, this exercises the chain's real failure modes:
    intra-object color variation, soft shadows, background texture.
    Returns (image uint8, gt_masks list)."""
    import numpy as np

    rng = np.random.default_rng(42)
    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # textured wall + floor with a lighting gradient
    img = np.zeros((H, W, 3), np.float32)
    wall = np.array([0.55, 0.5, 0.45]) + 0.1 * np.sin(xx / 11.0)[..., None] * 0.3
    floor = np.array([0.4, 0.33, 0.28]) + 0.08 * np.sin(xx / 5.0 + yy / 7.0)[..., None]
    horizon = H * 2 // 3
    img[:horizon] = wall[:horizon]
    img[horizon:] = floor[horizon:]
    light = 1.0 - 0.35 * np.hypot((xx - W / 2) / W, (yy - H / 2) / H)[..., None]
    img *= light

    gt_masks = []
    objs = [
        ((35, 30, 85, 62), np.array([0.75, 0.2, 0.15])),   # red cabinet
        ((50, 75, 100, 105), np.array([0.15, 0.3, 0.7])),  # blue chair
        ((25, 118, 70, 146), np.array([0.8, 0.7, 0.2])),   # yellow lamp
    ]
    for (y0, x0, y1, x1), base in objs:
        m = np.zeros((H, W), bool)
        m[y0:y1, x0:x1] = True
        gt_masks.append(m)
        shade = 0.75 + 0.25 * ((xx[y0:y1, x0:x1] - x0) / max(x1 - x0, 1))
        tex = 1.0 + 0.08 * rng.standard_normal((y1 - y0, x1 - x0))
        img[y0:y1, x0:x1] = base * (shade * tex)[..., None]
        # soft drop shadow under the object
        sh0, sh1 = min(y1 + 1, H), min(y1 + 6, H)
        img[sh0:sh1, x0:x1] *= 0.82
    img += 0.02 * rng.standard_normal((H, W, 3))  # sensor noise
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), gt_masks


def test_wild_chain_on_photo_like_fixture():
    """ColorSegmentation -> border-prior -> tagger on a photo-like image:
    each ground-truth object must be covered by some returned instance
    (IoU>=0.3), and background texture must not dominate the output."""
    import numpy as np

    from labelany3d_tpu.data.wild import default_wild_source

    image, gt_masks = _photo_like_fixture()
    src = default_wild_source()
    inst = src.read_instances(image)
    assert len(inst.masks) > 0, "no instances on a photo-like scene"

    def iou(a, b):
        i = np.logical_and(a, b).sum()
        u = np.logical_or(a, b).sum()
        return i / max(u, 1)

    covered = 0
    for gt in gt_masks:
        best = max((iou(gt, m) for m in inst.masks), default=0.0)
        if best >= 0.3:
            covered += 1
    assert covered >= 2, f"only {covered}/3 objects found"
    # instances shouldn't be wall/floor-sized
    assert all(m.sum() < 0.5 * image.shape[0] * image.shape[1] for m in inst.masks)


def test_wild_chain_failure_mode_low_contrast():
    """Failure-mode surface: an object matching the background color is
    (expectedly) missed by the color baseline — the test documents the
    behavior so a learned segmenter upgrade shows up as a diff."""
    import numpy as np

    from labelany3d_tpu.data.wild import ColorSegmentation

    rng = np.random.default_rng(0)
    # mid-bin background (bin width 64 at levels=4: [64,128) -> center 96)
    img = np.full((96, 128, 3), 90, np.uint8)
    img = (img + rng.integers(-3, 3, img.shape)).astype(np.uint8)  # subtle noise
    # low-contrast object: +8 gray levels, still inside the same bin
    img[30:60, 40:90] = np.clip(img[30:60, 40:90].astype(int) + 8, 0, 255).astype(np.uint8)
    masks = ColorSegmentation(levels=4).segment(img)
    target = np.zeros((96, 128), bool)
    target[30:60, 40:90] = True
    best = max(
        ((m & target).sum() / max((m | target).sum(), 1) for m in masks),
        default=0.0,
    )
    assert best < 0.5  # the color baseline cannot separate low contrast
