"""DepthPro-equivalent metric monocular depth (multi-scale ViT, Flax).

Behavioral parity target: `external/ml-depth-pro/src/depth_pro/depth_pro.py:
72,244-299` in the reference tree: a multi-scale ViT encoder + DPT-style
fusion decoder predicting *canonical inverse depth*, converted to metric by
the focal length: inverse_depth = canonical * (W / f_px); depth =
1 / clamp(inverse_depth). The labeling pipeline conditions it on MoGe's
recovered focal (`src/batch_scripts/depth.py:149`).

TPU-first design: the reference tiles a 1536x1536 input into 35 overlapping
384-pixel patches plus a global view, each a separate ViT batch, then
merges on host. Here the multi-scale encoder processes the global view and a
2x2 half-resolution tiling *as one batched ViT call* (static shapes, one
program), and the fusion decoder is a small conv pyramid — the same
global-context + local-detail structure without host-side patch plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    backbone: ViTConfig = dataclasses.field(default_factory=ViTConfig.large)
    fusion_width: int = 256
    input_size: int = 768          # square processing resolution (bucketed)
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "DepthProConfig":
        return DepthProConfig(
            backbone=ViTConfig.tiny_test(), fusion_width=32, input_size=64
        )


class FusionBlock(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip_proj")(skip)
        h = nn.gelu(nn.Conv(self.features, (3, 3), dtype=self.dtype, name="c1")(x), approximate=False)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="c2")(h)
        x = x + h
        b, hh, ww, c = x.shape
        return jax.image.resize(x, (b, hh * 2, ww * 2, c), method="bilinear")


class DepthProModel(nn.Module):
    """Image -> canonical inverse depth at input resolution."""

    cfg: DepthProConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, h, w, _ = images.shape
        half = jax.image.resize(images, (b, h // 2, w // 2, 3), method="bilinear", antialias=True)

        # Local detail stream: 2x2 tiling of the full image, batched with the
        # global stream through one ViT call (tiles are half-size crops, so
        # global is downsampled to tile size to share the program).
        th, tw = h // 2, w // 2
        tiles = jnp.concatenate(
            [
                images[:, :th, :tw],
                images[:, :th, tw:],
                images[:, th:, :tw],
                images[:, th:, tw:],
                half,
            ],
            axis=0,
        )  # (5B, th, tw, 3)
        enc = ViT(cfg.backbone, name="encoder")(tiles)
        gh, gw = enc["grid"]
        tok = enc["tokens"].reshape(5 * b, gh, gw, -1)
        t00, t01, t10, t11, g = jnp.split(tok, 5, axis=0)
        local = jnp.concatenate(
            [jnp.concatenate([t00, t01], axis=2), jnp.concatenate([t10, t11], axis=2)],
            axis=1,
        )  # (B, 2gh, 2gw, C)

        fw = cfg.fusion_width
        g_feat = nn.Conv(fw, (1, 1), dtype=cfg.dtype, name="global_proj")(g)
        l_feat = nn.Conv(fw, (1, 1), dtype=cfg.dtype, name="local_proj")(local)
        x = FusionBlock(fw, cfg.dtype, name="fuse_global")(g_feat)        # -> 2gh
        x = FusionBlock(fw, cfg.dtype, name="fuse_local")(x, skip=l_feat)  # -> 4gh
        # Decode to full resolution.
        b_, hh, ww, c = x.shape
        x = jax.image.resize(x, (b_, h, w, c), method="bilinear")
        x = nn.gelu(nn.Conv(fw // 2, (3, 3), dtype=cfg.dtype, name="head1")(x), approximate=False)
        x = nn.Conv(1, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="head2")(x)
        # Canonical inverse depth, positive via softplus.
        return jax.nn.softplus(x[..., 0])


def depth_pro_infer(
    model: DepthProModel,
    params,
    images: jnp.ndarray,
    f_px: jnp.ndarray,
    orig_width: jnp.ndarray | None = None,
    max_depth: float = 1e4,
) -> dict:
    """Metric depth from canonical inverse depth.

    Parity: `depth_pro.py:244-299` — inverse_depth = canonical * (W / f_px),
    depth = 1 / clip(inverse_depth, 1/max_depth, ...). `f_px` is the focal in
    pixels of the *original* image width (`orig_width`, defaults to the
    processing width). Batched and jittable.
    """
    canonical = model.apply({"params": params}, images)
    b, h, w = canonical.shape
    if orig_width is None:
        orig_width = jnp.full((b,), w, jnp.float32)
    f_px = jnp.broadcast_to(jnp.asarray(f_px, jnp.float32), (b,))
    orig_width = jnp.broadcast_to(jnp.asarray(orig_width, jnp.float32), (b,))
    inverse_depth = canonical * (orig_width / f_px)[:, None, None]
    depth = 1.0 / jnp.clip(inverse_depth, 1.0 / max_depth, 1e4)
    return {"depth": depth, "canonical_inverse_depth": canonical}
