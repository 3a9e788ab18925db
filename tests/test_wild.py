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
