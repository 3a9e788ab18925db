"""Crop/restore round-trip and mask analysis vs oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from labelany3d_tpu.geometry import (
    analyze_mask,
    crop_object_params,
    crop_resample,
    crop_to_image_coords,
    filter_instances,
    mask_bounding_rect,
    mask_max_height,
    restore_mask_from_crop,
)
from labelany3d_tpu.geometry.masks import binary_opening, upscale_mask_nearest
from tests.oracles import analyze_mask_np, crop_object_np, restore_mask_np


def _ellipse_mask(h, w, cy, cx, ry, rx):
    ys, xs = np.mgrid[:h, :w]
    return ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 <= 1.0


def test_mask_bounding_rect():
    m = np.zeros((40, 60), bool)
    m[10:25, 20:50] = True
    x, y, w, h = (int(v) for v in mask_bounding_rect(jnp.asarray(m)))
    assert (x, y, w, h) == (20, 10, 30, 15)


def test_mask_bounding_rect_empty():
    m = np.zeros((8, 8), bool)
    x, y, w, h = (int(v) for v in mask_bounding_rect(jnp.asarray(m)))
    assert (x, y, w, h) == (0, 0, 0, 0)


def test_crop_params_match_reference_arithmetic(rng):
    img = rng.uniform(0, 255, (120, 160, 3))
    m = _ellipse_mask(120, 160, 60, 80, 25, 35)
    _, _, (ox, oy, sc), (x, y, w, h, side) = crop_object_np(img, m, crop_size=64)
    p = crop_object_params(jnp.asarray(m), crop_size=64)
    assert float(p.offset_x) == pytest.approx(ox)
    assert float(p.offset_y) == pytest.approx(oy)
    assert float(p.scale) == pytest.approx(sc)
    assert int(p.side_len) == side


def test_crop_resample_matches_padded_resize(rng):
    img = rng.uniform(0, 255, (120, 160, 3))
    m = _ellipse_mask(120, 160, 60, 80, 25, 35)
    padded_img, padded_mask, (ox, oy, sc), (x, y, w, h, side) = crop_object_np(img, m, crop_size=64)
    p = crop_object_params(jnp.asarray(m), crop_size=64)
    rgb, mc = crop_resample(jnp.asarray(img, jnp.float32), jnp.asarray(m), p, crop_size=64)
    # Oracle resize: cv2-style bilinear of the padded square.
    out = np.zeros((64, 64, 3))
    ratio = side / 64
    for i in range(64):
        for j in range(64):
            sy = (i + 0.5) * ratio - 0.5
            sx = (j + 0.5) * ratio - 0.5
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            fy, fx = sy - y0, sx - x0
            acc = np.zeros(3)
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < side and 0 <= xx < side:
                        acc += wy * wx * padded_img[yy, xx]
            out[i, j] = acc
    np.testing.assert_allclose(np.asarray(rgb), out, atol=1.5)
    # mask crop: a strict subset of the bilinear-interpolated mask support
    assert np.asarray(mc).sum() > 0


def test_restore_mask_roundtrip(rng):
    m = _ellipse_mask(120, 160, 60, 80, 25, 35)
    p = crop_object_params(jnp.asarray(m), crop_size=128)
    _, mc = crop_resample(jnp.zeros((120, 160, 3)), jnp.asarray(m), p, crop_size=128)
    restored = np.asarray(
        restore_mask_from_crop(mc, p.offset_x, p.offset_y, p.scale, (120, 160))
    )
    inter = (restored & m).sum()
    union = (restored | m).sum()
    assert inter / union > 0.9  # resampling round-trip keeps the object


def test_restore_mask_matches_oracle(rng):
    crop = rng.uniform(size=(64, 64)) > 0.5
    ox, oy, sc = 17.3, -4.2, 1.6
    ours = np.asarray(restore_mask_from_crop(jnp.asarray(crop), ox, oy, sc, (100, 140)))
    ref = restore_mask_np(crop.astype(np.uint8), ox, oy, sc, (100, 140))
    assert (ours == ref).mean() > 0.999


def test_crop_to_image_coords():
    pts = jnp.array([[64.0, 128.0]])
    out = np.asarray(crop_to_image_coords(pts, 10.0, 20.0, 2.0))
    np.testing.assert_allclose(out, [[42.0, 84.0]])


def test_analyze_mask_matches_oracle(rng):
    for _ in range(5):
        m = rng.uniform(size=(80, 100)) > 0.8
        trunc_ref, scale_ref = analyze_mask_np(m)
        stats = analyze_mask(jnp.asarray(m))
        assert bool(stats.truncated) == trunc_ref
        assert bool(stats.scaleable) == scale_ref


def test_mask_max_height():
    m = np.zeros((50, 50), bool)
    m[10, 5] = True
    m[30, 40] = True
    assert int(mask_max_height(jnp.asarray(m))) == 21
    assert int(mask_max_height(jnp.zeros((5, 5), bool))) == 0


def test_filter_instances():
    h, w = 160, 160
    masks = np.zeros((3, h, w), bool)
    masks[0, 60:100, 60:100] = True          # keep: tall, interior, big
    masks[1, 0:40, 60:100] = True            # drop: truncated at top
    masks[2, 80:84, 80:84] = True            # drop: too small
    keep = np.asarray(filter_instances(jnp.asarray(masks), h))
    assert keep.tolist() == [True, False, False]


def test_binary_opening_matches_scipy(rng):
    from scipy.ndimage import binary_opening as scipy_open

    m = rng.uniform(size=(64, 64)) > 0.35
    ours = np.asarray(binary_opening(jnp.asarray(m), size=7))
    ref = scipy_open(m, np.ones((7, 7)))
    assert (ours == ref).all()


def test_upscale_mask_nearest():
    m = np.array([[1, 0], [0, 1]], bool)
    up = np.asarray(upscale_mask_nearest(jnp.asarray(m), 4))
    assert up.shape == (8, 8)
    assert up[:4, :4].all() and not up[:4, 4:].any()
