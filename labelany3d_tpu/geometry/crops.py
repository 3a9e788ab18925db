"""Instance crop bookkeeping: square padded crops and their inverse maps.

Parity targets in the reference repo:
  * `src/util.py:140-160` (`crop_object`): bounding rect of the mask, pad to
    a square of side max(w, h)/0.7 centered on the object, resize to
    `crop_size`. (The reference passes INTER_LANCZOS4 as cv2.resize's *dst*
    positional argument, so the actual interpolation is the bilinear
    default — reproduced here.)
  * `src/util.py:171-214` (`restore_mask_from_crop`): nearest-resize the
    crop-space mask back to the pre-padded size and paste at the rounded
    offset.

TPU-first: instead of pad-then-resize (dynamic intermediate shapes), each
output pixel inverse-maps to a source coordinate and is sampled directly —
one fixed-shape gather per crop, vmappable over instances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CropParams(NamedTuple):
    offset_x: jnp.ndarray   # crop-center offsets relative to the image
    offset_y: jnp.ndarray
    scale: jnp.ndarray      # crop_size / side_len
    x: jnp.ndarray          # bounding rect (for the integer paste offsets)
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    side_len: jnp.ndarray


def mask_bounding_rect(mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """cv2.boundingRect semantics: (x, y, w, h) ints; zeros for empty masks."""
    mask = jnp.asarray(mask, bool)
    h, w = mask.shape[-2], mask.shape[-1]
    cols = jnp.any(mask, axis=-2)
    rows = jnp.any(mask, axis=-1)
    col_idx = jnp.arange(w, dtype=jnp.int32)
    row_idx = jnp.arange(h, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    x0 = jnp.min(jnp.where(cols, col_idx, big), axis=-1)
    x1 = jnp.max(jnp.where(cols, col_idx, -big), axis=-1)
    y0 = jnp.min(jnp.where(rows, row_idx, big), axis=-1)
    y1 = jnp.max(jnp.where(rows, row_idx, -big), axis=-1)
    empty = ~jnp.any(mask, axis=(-2, -1))
    x0 = jnp.where(empty, 0, x0)
    y0 = jnp.where(empty, 0, y0)
    bw = jnp.where(empty, 0, x1 - x0 + 1)
    bh = jnp.where(empty, 0, y1 - y0 + 1)
    return x0, y0, bw, bh


def crop_object_params(mask: jnp.ndarray, crop_size: int = 512, ratio: float = 0.7) -> CropParams:
    """Compute the crop geometry of `src/util.py:140-160` (no resampling yet)."""
    x, y, w, h = mask_bounding_rect(mask)
    max_size = jnp.maximum(w, h)
    side_len = jnp.floor(max_size.astype(jnp.float32) / ratio).astype(jnp.int32)
    side_len = jnp.maximum(side_len, 1)
    offset_x = x.astype(jnp.float32) + (w - side_len).astype(jnp.float32) / 2.0
    offset_y = y.astype(jnp.float32) + (h - side_len).astype(jnp.float32) / 2.0
    scale = jnp.float32(crop_size) / side_len.astype(jnp.float32)
    return CropParams(offset_x, offset_y, scale, x, y, w, h, side_len)


def _bilinear_gather(
    image: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    rect=None,
) -> jnp.ndarray:
    """Bilinear sample with zero padding. image (H, W[, C]); ys/xs any shape.

    When `rect` = (x, y, w, h) is given, taps outside that rectangle read as
    zero — reproducing a paste-into-zero-square followed by bilinear resize
    (the blend at the rectangle border fades over one pixel, as cv2 does).
    """
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        if rect is not None:
            rx, ry, rw, rh = rect
            inside = inside & (yi >= ry) & (yi < ry + rh) & (xi >= rx) & (xi < rx + rw)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]
        return jnp.where(inside[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    if image.ndim == 2:
        out = out[..., 0]
    return out


def crop_resample(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    params: CropParams,
    crop_size: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Produce the (crop_size, crop_size) RGB crop and boolean mask crop.

    Equivalent to the reference's paste-into-square-then-cv2.resize
    (`src/util.py:147-154`) but as one inverse-map bilinear gather. The
    paste offsets use the same integer arithmetic (center = side//2,
    start = center - w//2) so crops match to resampling precision.
    """
    out_idx = jnp.arange(crop_size, dtype=jnp.float32)
    # cv2 bilinear: src = (dst + 0.5) * (src_size / dst_size) - 0.5
    inv_scale = params.side_len.astype(jnp.float32) / jnp.float32(crop_size)
    q = (out_idx + 0.5) * inv_scale - 0.5  # padded-square coordinates
    center = params.side_len // 2
    row_start = (center - params.h // 2).astype(jnp.float32)
    col_start = (center - params.w // 2).astype(jnp.float32)
    src_y = q[:, None] - row_start + params.y.astype(jnp.float32)
    src_x = q[None, :] - col_start + params.x.astype(jnp.float32)
    ys = jnp.broadcast_to(src_y, (crop_size, crop_size))
    xs = jnp.broadcast_to(src_x, (crop_size, crop_size))

    # Zero padding outside the pasted object window (the reference pastes
    # only the rect [y:y+h, x:x+w] into a zero square); out-of-rect taps read
    # zero inside the bilinear blend.
    rect = (params.x, params.y, params.w, params.h)
    rgb = _bilinear_gather(image, ys, xs, rect=rect)
    m = _bilinear_gather(mask.astype(jnp.float32), ys, xs, rect=rect)
    # Reference: resized uint8 mask == 1, i.e. only exactly-interior pixels.
    return rgb, m >= 0.999


def restore_mask_from_crop(
    resized_mask: jnp.ndarray,
    offset_x: jnp.ndarray,
    offset_y: jnp.ndarray,
    scale: jnp.ndarray,
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Map a crop-space mask back onto the full image; (H, W) bool.

    Parity: `src/util.py:171-214`. The reference nearest-resizes the crop to
    `int(crop/scale)` and pastes at the rounded offset; here every output
    pixel nearest-samples the crop directly (cv2 INTER_NEAREST uses
    src = floor(dst * src_size/dst_size) with no half-pixel shift).
    """
    crop = jnp.asarray(resized_mask)
    crop_size = crop.shape[-1]
    oh, ow = out_shape
    # int(crop/scale): scale = crop_size/side_len with integer side_len, so
    # the quotient is mathematically an integer — but float32 can land a
    # hair BELOW it (256/float32(2.048) = 124.99999 vs the reference's
    # float64 125), and a bare floor then loses a whole pixel of paste
    # size. Nudge by one ulp-scale epsilon before flooring.
    q = jnp.float32(crop_size) / scale
    ocs = jnp.floor(q * (1.0 + 1e-6)).astype(jnp.int32)
    ocs = jnp.maximum(ocs, 1)
    x1 = jnp.round(offset_x).astype(jnp.int32)
    y1 = jnp.round(offset_y).astype(jnp.int32)

    ys = jnp.arange(oh, dtype=jnp.int32)[:, None]
    xs = jnp.arange(ow, dtype=jnp.int32)[None, :]
    u = xs - x1  # position inside the unpadded (ocs x ocs) mask
    v = ys - y1
    inside = (u >= 0) & (u < ocs) & (v >= 0) & (v < ocs)
    ratio = jnp.float32(crop_size) / ocs.astype(jnp.float32)
    cu = jnp.clip(jnp.floor(u.astype(jnp.float32) * ratio).astype(jnp.int32), 0, crop_size - 1)
    cv = jnp.clip(jnp.floor(v.astype(jnp.float32) * ratio).astype(jnp.int32), 0, crop_size - 1)
    vals = crop[cv, cu]
    return jnp.where(inside, vals.astype(bool), False)


def crop_to_image_coords(
    pts_crop: jnp.ndarray, offset_x, offset_y, scale
) -> jnp.ndarray:
    """Map (..., 2) crop-pixel coordinates to full-image pixels.

    Parity: `src/matching/process_image_space.py:128`
    (`matches/crop_params[2] + [offset_x, offset_y]`).
    """
    offs = jnp.stack(jnp.broadcast_arrays(jnp.asarray(offset_x, jnp.float32),
                                          jnp.asarray(offset_y, jnp.float32)), axis=-1)
    return pts_crop / jnp.asarray(scale, jnp.float32)[..., None] + offs
