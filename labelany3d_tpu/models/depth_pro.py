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


# --------------------------------------------------------------------------
# Checkpoint-faithful variant: the released DepthPro graph
# (`external/ml-depth-pro/src/depth_pro/network/{encoder,decoder,fov}.py`).
# The 35-patch pyramid is one batched ViT call (35B x 384^2 — static shapes,
# MXU-friendly); split/merge are static slices, so the whole forward jits.
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DepthPro35Config:
    """Mirror of the reference DEFAULT_MONODEPTH_CONFIG_DICT
    (dinov2l16_384 encoders; `depth_pro.py:39-45`, `vit_factory.py:57-58`)."""

    patch_encoder: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig.large(patch_size=16, out_indices=(5, 11))
    )
    image_encoder: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig.large(patch_size=16)
    )
    fov_encoder: ViTConfig | None = dataclasses.field(
        default_factory=lambda: ViTConfig.large(patch_size=16)
    )
    dims_encoder: tuple = (256, 512, 1024, 1024)
    decoder_features: int = 256
    patch_res: int = 384            # backbone resolution
    img_size: int = 1536            # = 4 * patch_res
    last_dims: tuple = (32, 1)
    fov_final_kernel: int = 6       # head's closing conv (6 -> 1x1 at 384)
    dtype: Any = jnp.bfloat16

    @staticmethod
    def tiny_test() -> "DepthPro35Config":
        # vit_patch must be 16 like the real config: the decoder's
        # resolution algebra (x8 latent0 upsample + head x2) closes back to
        # img_size only at a 16-px token stride.
        vit = dataclasses.replace(ViTConfig.tiny_test(), patch_size=16)
        return DepthPro35Config(
            patch_encoder=dataclasses.replace(vit, out_indices=(0, 1)),
            image_encoder=vit,
            fov_encoder=vit,
            dims_encoder=(8, 16, 16, 16),
            decoder_features=8,
            patch_res=128,
            img_size=512,
            last_dims=(8, 1),
            fov_final_kernel=2,  # closes the 2x2 tiny fov grid to 1x1
            dtype=jnp.float32,
        )


def split_overlap(x: jnp.ndarray, patch: int, stride: int) -> jnp.ndarray:
    """Sliding-window split, reference batch layout (`encoder.py:170-188`):
    output batch index = (row * steps + col) * B + b."""
    size = x.shape[1]
    steps = -(-(size - patch) // stride) + 1
    out = []
    for j in range(steps):
        for i in range(steps):
            out.append(x[:, j * stride:j * stride + patch, i * stride:i * stride + patch])
    return jnp.concatenate(out, axis=0)


def merge_overlap(x: jnp.ndarray, batch_size: int, padding: int) -> jnp.ndarray:
    """Inverse of split: crop `padding` from interior edges and tile
    (`encoder.py:190-217`)."""
    steps = int(round((x.shape[0] // batch_size) ** 0.5))
    rows = []
    idx = 0
    for j in range(steps):
        cols = []
        for i in range(steps):
            t = x[batch_size * idx:batch_size * (idx + 1)]
            if j != 0:
                t = t[:, padding:]
            if j != steps - 1:
                t = t[:, :t.shape[1] - padding]
            if i != 0:
                t = t[:, :, padding:]
            if i != steps - 1:
                t = t[:, :, :t.shape[2] - padding]
            cols.append(t)
            idx += 1
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


class _ProjUpsample(nn.Module):
    """1x1 projection + N stride-2 deconvs, all bias-free
    (`encoder.py:60-93`)."""

    dim_int: int
    dim_out: int
    n_up: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_int, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(x)
        for i in range(self.n_up):
            x = nn.ConvTranspose(self.dim_out, (2, 2), strides=(2, 2), use_bias=False,
                                 dtype=self.dtype, name=f"deconv{i}")(x)
        return x


class _ResidualUnit(nn.Module):
    """[ReLU, conv3, ReLU, conv3] + identity (`decoder.py:182-199`)."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(nn.relu(h))
        return x + h


class _FusionBlock(nn.Module):
    """DPT FeatureFusionBlock2d (`decoder.py:120-179`)."""

    features: int
    deconv: bool
    dtype: Any

    @nn.compact
    def __call__(self, x0, x1=None):
        x = x0
        if x1 is not None:
            x = x + _ResidualUnit(self.features, self.dtype, name="res1")(x1)
        x = _ResidualUnit(self.features, self.dtype, name="res2")(x)
        if self.deconv:
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2), use_bias=False,
                                 dtype=self.dtype, name="deconv")(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DepthPro35(nn.Module):
    """Checkpoint-faithful DepthPro: canonical inverse depth + FoV (deg).

    Forward parity: encoder pyramid/split/merge (`encoder.py:233-330`),
    MultiresConvDecoder (`decoder.py:74-94`), head (`depth_pro.py:182-207`),
    FOVNetwork (`fov.py:11-83`). Weights load via
    `convert.convert_depth_pro`.
    """

    cfg: DepthPro35Config

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        cfg = self.cfg
        b = images.shape[0]
        assert images.shape[1] == images.shape[2] == cfg.img_size
        p = cfg.patch_res
        x0 = images
        x1 = jax.image.resize(images, (b, cfg.img_size // 2, cfg.img_size // 2, 3),
                              method="bilinear")
        x2 = jax.image.resize(images, (b, p, p, 3), method="bilinear")

        x0_p = split_overlap(x0, p, int(p * 0.75))   # 5x5, overlap 0.25
        x1_p = split_overlap(x1, p, int(p * 0.5))    # 3x3, overlap 0.5
        n0, n1 = x0_p.shape[0], x1_p.shape[0]
        patches = jnp.concatenate([x0_p, x1_p, x2], axis=0)  # (35B, p, p, 3)

        enc = ViT(cfg.patch_encoder, name="patch_encoder")(patches)
        gh, gw = enc["grid"]
        C = enc["tokens"].shape[-1]

        def grid(t):
            return t.reshape(t.shape[0], gh, gw, C)

        hook0, hook1 = (grid(h) for h in enc["hiddens"])      # (35B, gh, gw, C)
        tokens = grid(enc["tokens"])

        # Seam crops scale with the token grid: overlap 0.25 -> gh/8 per
        # side, overlap 0.5 -> gh/4 (3 and 6 at the reference's gh=24).
        pad0, pad1 = gh // 8, gh // 4
        latent0 = merge_overlap(hook0[:n0], b, padding=pad0)
        latent1 = merge_overlap(hook1[:n0], b, padding=pad0)
        f0 = merge_overlap(tokens[:n0], b, padding=pad0)       # 4gh
        f1 = merge_overlap(tokens[n0:n0 + n1], b, padding=pad1)  # 2gh
        f2 = tokens[n0 + n1:]                                  # gh

        g_enc = ViT(cfg.image_encoder, name="image_encoder")(x2)
        g = g_enc["tokens"].reshape(b, gh, gw, -1)

        de = cfg.dims_encoder
        df = cfg.decoder_features
        latent0 = _ProjUpsample(de[0], df, 3, cfg.dtype, name="upsample_latent0")(latent0)
        latent1 = _ProjUpsample(de[0], de[0], 2, cfg.dtype, name="upsample_latent1")(latent1)
        f0 = _ProjUpsample(de[1], de[1], 1, cfg.dtype, name="upsample0")(f0)
        f1 = _ProjUpsample(de[2], de[2], 1, cfg.dtype, name="upsample1")(f1)
        f2 = _ProjUpsample(de[3], de[3], 1, cfg.dtype, name="upsample2")(f2)
        g = nn.ConvTranspose(de[3], (2, 2), strides=(2, 2), dtype=cfg.dtype,
                             name="upsample_lowres")(g)
        g = nn.Conv(de[3], (1, 1), dtype=cfg.dtype, name="fuse_lowres")(
            jnp.concatenate([f2, g], axis=-1))

        # MultiresConvDecoder over [latent0, latent1, f0, f1, g]:
        # dims [df] + dims_encoder; conv0 identity when dims match.
        encodings = [latent0, latent1, f0, f1, g]
        dims = [df] + list(de)
        feats = nn.Conv(df, (3, 3), use_bias=False, dtype=cfg.dtype, name="dec_conv4")(encodings[4])
        lowres_features = feats
        feats = _FusionBlock(df, True, cfg.dtype, name="dec_fusion4")(feats)
        for i in (3, 2, 1, 0):
            if i == 0 and dims[0] == df:
                proj = encodings[0]
            else:
                k, use_bias = ((1, 1), False) if i == 0 else ((3, 3), False)
                proj = nn.Conv(df, k, use_bias=use_bias, dtype=cfg.dtype,
                               name=f"dec_conv{i}")(encodings[i])
            feats = _FusionBlock(df, i != 0, cfg.dtype, name=f"dec_fusion{i}")(feats, proj)

        # Head: conv3 -> deconv2 -> conv3 -> ReLU -> conv1 -> ReLU.
        h = nn.Conv(df // 2, (3, 3), dtype=cfg.dtype, name="head_c1")(feats)
        h = nn.ConvTranspose(df // 2, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                             name="head_deconv")(h)
        h = nn.Conv(cfg.last_dims[0], (3, 3), dtype=cfg.dtype, name="head_c2")(h)
        h = nn.Conv(cfg.last_dims[1], (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                    name="head_c3")(nn.relu(h))
        canonical = nn.relu(h[..., 0].astype(jnp.float32))

        # FOV network (fov.py:56-83): fov-encoder tokens + downsampled
        # decoder features -> degrees.
        fov_deg = None
        if cfg.fov_encoder is not None:
            xf = jax.image.resize(images, (b, cfg.img_size // 4, cfg.img_size // 4, 3),
                                  method="bilinear")
            fenc = ViT(cfg.fov_encoder, name="fov_encoder")(xf)
            ftok = nn.Dense(df // 2, dtype=cfg.dtype, name="fov_enc_linear")(fenc["tokens"])
            fgh, fgw = fenc["grid"]
            ftok = ftok.reshape(b, fgh, fgw, df // 2)
            low = nn.relu(nn.Conv(df // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                  dtype=cfg.dtype, name="fov_down")(
                jax.lax.stop_gradient(lowres_features)))
            z = ftok + low  # fov.py:78-80 — no activation between add and head
            z = nn.relu(nn.Conv(df // 4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                dtype=cfg.dtype, name="fov_h0")(z))
            z = nn.relu(nn.Conv(max(df // 8, 1), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                dtype=cfg.dtype, name="fov_h1")(z))
            k = cfg.fov_final_kernel
            z = nn.Conv(1, (k, k), padding="VALID", dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fov_h2")(z.astype(jnp.float32))
            fov_deg = z.reshape(b)

        out = {"canonical_inverse_depth": canonical}
        if fov_deg is not None:
            out["fov_deg"] = fov_deg
        return out


def depth_pro35_infer(
    model: DepthPro35,
    params,
    images: jnp.ndarray,
    f_px: jnp.ndarray | None = None,
    max_depth: float = 1e4,
) -> dict:
    """Reference `DepthPro.infer` (`depth_pro.py:244-299`): when `f_px` is
    None, the focal comes from the predicted FoV:
    f_px = 0.5 * W / tan(0.5 * fov)."""
    out = model.apply({"params": params}, images)
    canonical = out["canonical_inverse_depth"]
    b, h, w = canonical.shape
    if f_px is None:
        fov = jnp.deg2rad(out["fov_deg"])
        f_px = 0.5 * w / jnp.tan(0.5 * fov)
    f_px = jnp.broadcast_to(jnp.asarray(f_px, jnp.float32), (b,))
    inverse_depth = canonical * (w / f_px)[:, None, None]
    depth = 1.0 / jnp.clip(inverse_depth, 1.0 / max_depth, 1e4)
    res = {"depth": depth, "canonical_inverse_depth": canonical, "f_px": f_px}
    if "fov_deg" in out:
        res["fov_deg"] = out["fov_deg"]
    return res


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
