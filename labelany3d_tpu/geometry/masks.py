"""Instance-mask analysis and filtering, batched over instance slots.

Parity targets in the reference repo:
  * `src/util.py:291-326` (`analyze_mask`): truncation = mask pixels inside
    the 10-px image border bands >= 10; scale = mask area >= 100.
  * `src/util.py:328-335` (`get_maximum_height`).
  * `src/util.py:337-382` (`read_bounding_boxes_segmentations` filter):
    keep when height/image_height > 0.0625 AND not truncated AND scaleable.
  * `src/batch_scripts/get_crops_enhanced.py:91-95`: 7x7 binary opening and
    a 6400-px minimum area on the 4x-upscaled mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MaskStats(NamedTuple):
    truncated: jnp.ndarray   # bool: touches image border bands
    scaleable: jnp.ndarray   # bool: area above threshold
    area: jnp.ndarray        # int32 pixel count
    height: jnp.ndarray      # int32 vertical extent in pixels


def mask_max_height(mask: jnp.ndarray) -> jnp.ndarray:
    """Vertical extent (last occupied row - first + 1); 0 for empty masks.

    Parity: `src/util.py:328-335`.
    """
    mask = jnp.asarray(mask, bool)
    rows = jnp.any(mask, axis=-1)
    h = rows.shape[-1]
    idx = jnp.arange(h, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    first = jnp.min(jnp.where(rows, idx, big), axis=-1)
    last = jnp.max(jnp.where(rows, idx, -big), axis=-1)
    empty = ~jnp.any(rows, axis=-1)
    return jnp.where(empty, 0, last - first + 1)


def analyze_mask(
    mask: jnp.ndarray,
    scale_threshold: int = 100,
    boundary_threshold: int = 10,
    truncation_count: int = 10,
) -> MaskStats:
    """Truncation / scale statistics of (..., H, W) boolean masks.

    Parity: `src/util.py:291-326`. Note the reference sums the four border
    bands independently, so corner pixels count twice — reproduced here.
    """
    mask = jnp.asarray(mask, bool)
    m = mask.astype(jnp.int32)
    area = jnp.sum(m, axis=(-2, -1))
    b = boundary_threshold
    top = jnp.sum(m[..., :b, :], axis=(-2, -1))
    bottom = jnp.sum(m[..., -b:, :], axis=(-2, -1))
    left = jnp.sum(m[..., :, :b], axis=(-2, -1))
    right = jnp.sum(m[..., :, -b:], axis=(-2, -1))
    total_truncation = top + bottom + left + right
    return MaskStats(
        truncated=total_truncation >= truncation_count,
        scaleable=area >= scale_threshold,
        area=area,
        height=mask_max_height(mask),
    )


def filter_instances(
    masks: jnp.ndarray,
    image_height: int,
    min_height_frac: float = 0.0625,
) -> jnp.ndarray:
    """Keep flags for (I, H, W) instance masks.

    Parity: `src/util.py:374-375` — an instance survives when its vertical
    extent exceeds 6.25% of the image height, it is not border-truncated,
    and its area passes the scale threshold.
    """
    stats = analyze_mask(masks)
    tall_enough = stats.height.astype(jnp.float32) / jnp.float32(image_height) > min_height_frac
    return tall_enough & (~stats.truncated) & stats.scaleable


def binary_opening(mask: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Binary opening with a size x size all-ones structuring element.

    Parity: `scipy.ndimage.binary_opening(mask, np.ones((7, 7)))` at
    `src/batch_scripts/get_crops_enhanced.py:91`. Erosion/dilation are
    separable min/max filters implemented with `jax.lax.reduce_window`, so
    the whole op stays on-device.
    """
    import jax

    m = jnp.asarray(mask, bool)
    squeeze = m.ndim == 2
    if squeeze:
        m = m[None]

    def erode(x):
        return jax.lax.reduce_window(
            x, True, jax.lax.bitwise_and,
            window_dimensions=(1, size, size),
            window_strides=(1, 1, 1),
            padding=((0, 0), (size // 2, size - 1 - size // 2), (size // 2, size - 1 - size // 2)),
        )

    def dilate(x):
        return jax.lax.reduce_window(
            x, False, jax.lax.bitwise_or,
            window_dimensions=(1, size, size),
            window_strides=(1, 1, 1),
            padding=((0, 0), (size // 2, size - 1 - size // 2), (size // 2, size - 1 - size // 2)),
        )

    # scipy's border_value for erosion defaults to 0 outside, which our
    # padding init value True would violate; mask out-of-bounds manually by
    # padding with False then eroding with True init inside the valid area.
    pad = size // 2
    mp = jnp.pad(m, ((0, 0), (pad, pad), (pad, pad)), constant_values=False)
    er = jax.lax.reduce_window(
        mp, True, jax.lax.bitwise_and,
        window_dimensions=(1, size, size), window_strides=(1, 1, 1),
        padding="VALID",
    )
    out = dilate(er)
    if squeeze:
        out = out[0]
    return out


def upscale_mask_nearest(mask: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """Nearest-neighbor integer upscale (the 4x COCONUT->enhanced resize at
    `src/batch_scripts/get_crops_enhanced.py:68-76`)."""
    m = jnp.asarray(mask)
    m = jnp.repeat(m, factor, axis=-2)
    m = jnp.repeat(m, factor, axis=-1)
    return m
