"""MoGe-equivalent monocular geometry model: affine point map + intrinsics.

Behavioral parity target: `external/MoGe/moge/model/moge_model.py:298-393`
(`MoGeModel.infer`) in the reference tree — a DINOv2 ViT-L backbone with a
convolutional upsampling head producing an affine-invariant point map and a
validity mask, followed by focal/shift recovery, intrinsics assembly and
projection-consistent depth.

TPU-first differences from the reference:
  * the whole `infer` path (forward, focal/shift recovery, re-projection,
    resize) is one jittable function — the reference round-trips through
    scipy on host for the focal solve (`geometry_torch.py:149-160`); here
    `labelany3d_tpu.geometry.focal.recover_focal_shift` runs on-device and
    batches over images;
  * resolution handling is bucketed: callers pick a static processing size
    per bucket (`expected_area` in the reference is resolution_level-driven;
    same formula exposed via `MoGeConfig.processing_size`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from labelany3d_tpu.geometry.focal import (
    intrinsics_from_diag_focal,
    recover_focal_shift,
)
from labelany3d_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    backbone: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig.large(out_indices=(5, 11, 17, 23))
    )
    head_width: int = 256
    num_upsamples: int = 2          # conv-pyramid 2x upsamples before final resize
    remap_output: str = "exp"       # 'linear' | 'sinh' | 'exp' | 'sinh_exp'
    output_mask: bool = True
    dtype: Any = jnp.bfloat16
    # Head style: 'tpu' = fused resize/conv pyramid (fast, trained here);
    # 'reference' = checkpoint-faithful graph matching the released MoGe
    # head (`moge_model.py:60-141`) so torch weights convert 1:1.
    head_style: str = "tpu"
    # reference-head hyperparameters (moge_model.py:61-72 defaults)
    dim_proj: int = 512
    dim_upsample: tuple = (256, 128, 128)
    num_res_blocks: int = 1
    last_res_blocks: int = 0
    last_conv_channels: int = 32
    last_conv_size: int = 1
    split_head: bool = True         # dim_out [3, 1] vs a single 4-ch conv

    @staticmethod
    def tiny_test() -> "MoGeConfig":
        return MoGeConfig(
            backbone=ViTConfig.tiny_test(out_indices=(0, 1)),
            head_width=32,
            num_upsamples=1,
        )

    @staticmethod
    def vitl() -> "MoGeConfig":
        """Shape of the released `Ruicheng/moge-vitl` checkpoint:
        intermediate_layers=4 (last four blocks), split mask head,
        exp-remapped output (moge_model.py:148-199)."""
        return MoGeConfig(
            backbone=ViTConfig.large(
                out_indices=(20, 21, 22, 23), norm_hiddens=True,
                pos_grid=(37, 37),  # DINOv2-L/14 checkpoint grid (518px)
            ),
            head_style="reference",
            remap_output="exp",
            output_mask=True,
            split_head=True,
        )

    @staticmethod
    def tiny_reference_test() -> "MoGeConfig":
        return MoGeConfig(
            backbone=ViTConfig.tiny_test(out_indices=(0, 1), norm_hiddens=True),
            head_style="reference",
            dim_proj=16,
            dim_upsample=(8, 8),
            last_conv_channels=8,
            dtype=jnp.float32,
        )


class ConvBlock(nn.Module):
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(h)
        return nn.gelu(h, approximate=False)


class MoGeHead(nn.Module):
    """Multi-level token fusion -> conv pyramid -> point map + mask."""

    cfg: MoGeConfig

    @nn.compact
    def __call__(self, hiddens, grid, out_hw):
        cfg = self.cfg
        gh, gw = grid
        # Fuse intermediate backbone levels at the token resolution.
        feats = 0.0
        for i, h in enumerate(hiddens):
            proj = nn.Dense(cfg.head_width, dtype=cfg.dtype, name=f"level{i}")(h)
            feats = feats + proj
        x = feats.reshape(feats.shape[0], gh, gw, cfg.head_width)
        x = ConvBlock(cfg.head_width, cfg.dtype, name="fuse")(x)

        # Progressive 2x upsampling (resize + conv), then a final resize to
        # the full output resolution (patch sizes are not powers of two).
        for i in range(cfg.num_upsamples):
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="bilinear")
            x = ConvBlock(cfg.head_width, cfg.dtype, name=f"up{i}")(x)
        b, hh, ww, c = x.shape
        x = jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")
        x = nn.Conv(cfg.head_width // 2, (3, 3), dtype=cfg.dtype, name="out_conv")(x)
        x = nn.gelu(x, approximate=False)
        out_ch = 4 if cfg.output_mask else 3
        return nn.Conv(out_ch, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="out")(x)


def _conv3_replicate(x, features, name, dtype, param_dtype=jnp.float32):
    """3x3 conv with torch padding_mode='replicate' semantics."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return nn.Conv(
        features, (3, 3), padding="VALID", dtype=dtype, param_dtype=param_dtype, name=name
    )(x)


def _view_plane_uv(height: int, width: int, aspect: float):
    """Normalized view-plane UV grid; parity `geometry_torch.py:40-53`:
    corners at +-(w, h)/diagonal, sampled at pixel centers."""
    import numpy as np

    span_x = aspect / (1 + aspect**2) ** 0.5
    span_y = 1 / (1 + aspect**2) ** 0.5
    u = np.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    v = np.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height)
    uu, vv = np.meshgrid(u.astype("float32"), v.astype("float32"))
    return np.stack([uu, vv], axis=-1)  # (H, W, 2)


def _cat_uv(x, aspect):
    uv = jnp.asarray(_view_plane_uv(x.shape[1], x.shape[2], aspect), x.dtype)
    uv = jnp.broadcast_to(uv[None], (x.shape[0], *uv.shape))
    return jnp.concatenate([x, uv], axis=-1)


class ResidualConvBlock(nn.Module):
    """GroupNorm -> ReLU -> conv3 -> GroupNorm -> ReLU -> conv3 + skip;
    parity `moge_model.py:23-58` (activation='relu', norm='group_norm')."""

    features: int
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        skip = x
        if in_ch != self.features:
            skip = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="skip")(x)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm1")(x)
        h = _conv3_replicate(nn.relu(h), self.hidden, "conv1", self.dtype)
        h = nn.GroupNorm(num_groups=max(self.hidden // 32, 1), epsilon=1e-5, name="norm2")(h)
        h = _conv3_replicate(nn.relu(h), self.features, "conv2", self.dtype)
        return h + skip


class _ConvParams(nn.Module):
    """Parameter-only stand-in for an nn.Conv(features, (k, k)): declares the
    identical {kernel, bias} tree so fused apply-time combination (see
    MoGeCheckpointHead) leaves checkpoint layouts untouched."""

    features: int
    in_features: int
    ksize: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _bilinear_taps(in_size: int, out_size: int, pad: int):
    """Per-output-row tap indices/weights of a bilinear resize in the torch
    `F.interpolate(align_corners=False)` convention (parity
    `moge_model.py:131`), with `pad` edge-replicated rows fused on each
    side: a replicate-padded row is just the first/last row's taps again,
    so padding costs nothing beyond two extra gather rows."""
    import numpy as np

    pos = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(pos)
    w1 = (pos - base).astype(np.float32)
    i1 = np.clip(base + 1, 0, in_size - 1).astype(np.int32)
    i0 = np.clip(base, 0, in_size - 1).astype(np.int32)
    if pad:
        rep = lambda a: np.concatenate(
            [np.repeat(a[:1], pad), a, np.repeat(a[-1:], pad)])
        i0, i1, w1 = rep(i0), rep(i1), rep(w1)
    return i0, i1, w1


def _resize_matrix(in_size: int, out_size: int, pad: int):
    """The separable bilinear resize (+fused replicate pad) as a static
    two-banded (out+2*pad, in) matrix: row o holds the two tap weights of
    output row o. Rows sum to 1; coincident taps (edge clip) merge."""
    import numpy as np

    i0, i1, w1 = _bilinear_taps(in_size, out_size, pad)
    g = np.zeros((len(i0), in_size), np.float32)
    rows = np.arange(len(i0))
    np.add.at(g, (rows, i0), 1 - w1)
    np.add.at(g, (rows, i1), w1)
    return g


def _resize_bilinear_pad(x, out_hw, pad=1):
    """Separable bilinear resize fused with a replicate pad: writes the
    padded full-res tensor — the head's largest HBM term — ONCE. The
    resize-then-`jnp.pad` form this replaces materialized the ~0.5 GB
    (B=8, 520^2x130 bf16) tensor twice; the edge-pad concatenate alone
    was 7.1 ms of a 111 ms ViT-L/518 batch on the round-4 device profile.

    Each 1-D pass runs as a CONTRACTION against the static two-banded tap
    matrix, not a gather+blend: the 296->520 gather/add pair was ~10.7 ms
    of HBM-bound time per ViT-L batch on the round-4 profile (~200 GB/s
    effective — gathers don't stream), while the matmul form is ~0.26
    TFLOP of MXU work plus one streamed write of the output. Numerically
    each output row is the same two-term convex blend (the other 294
    products are exact zeros), f32-accumulated on the MXU."""
    gh = jnp.asarray(_resize_matrix(x.shape[1], out_hw[0], pad), x.dtype)
    gw = jnp.asarray(_resize_matrix(x.shape[2], out_hw[1], pad), x.dtype)
    t = jnp.einsum("oh,bhwc->bowc", gh, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("ow,bhwc->bhoc", gw, t,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _uv_conv_response(img_h, img_w, aspect, k_uv, bias, dtype):
    """Input-independent UV term of the output-block conv: the view-plane
    UV field depends only on (shape, aspect), so its replicate-padded 3x3
    conv response + bias is ONE (1, H, W, C) map derived from the weights.
    Splitting it out keeps the image conv's contraction dim at the aligned
    feature width (128 lanes) instead of a misaligned width+2; parity: the
    torch head convolves cat([x, uv]) jointly, and conv is linear in its
    input channels."""
    import numpy as np

    uv = np.pad(_view_plane_uv(img_h, img_w, aspect),
                ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        jnp.asarray(uv[None], dtype), k_uv, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


class MoGeCheckpointHead(nn.Module):
    """Checkpoint-faithful MoGe head (`moge_model.py:60-141`): per-level 1x1
    projections summed, ConvTranspose-2x upsample blocks with UV concat and
    residual conv blocks, bilinear resize to full resolution, then per-output
    conv blocks. Module graph and hyperparameters match the torch release so
    `convert.convert_moge_checkpoint` maps weights 1:1."""

    cfg: MoGeConfig

    @nn.compact
    def __call__(self, hiddens, grid, out_hw):
        cfg = self.cfg
        gh, gw = grid
        img_h, img_w = out_hw
        aspect = img_w / img_h

        x = 0.0
        for i, h in enumerate(hiddens):
            tok = h.reshape(h.shape[0], gh, gw, h.shape[-1])
            x = x + nn.Conv(
                cfg.dim_proj, (1, 1), dtype=cfg.dtype, param_dtype=jnp.float32,
                name=f"project{i}",
            )(tok)

        for i, out_ch in enumerate(cfg.dim_upsample):
            x = _cat_uv(x, aspect)
            x = nn.ConvTranspose(
                out_ch, (2, 2), strides=(2, 2), dtype=cfg.dtype,
                param_dtype=jnp.float32, name=f"up{i}_deconv",
            )(x)
            x = _conv3_replicate(x, out_ch, f"up{i}_conv", cfg.dtype)
            for r in range(cfg.num_res_blocks):
                x = ResidualConvBlock(out_ch, out_ch, cfg.dtype, name=f"up{i}_res{r}")(x)

        b, hh, ww, c = x.shape
        # Resize + shared replicate pad in ONE separable gather pass (bf16
        # configs blend in bf16: 4-tap convex blend needs no f32
        # accumulator; f32 configs/parity tests are unchanged).
        xp = _resize_bilinear_pad(x, (img_h, img_w))

        dim_out = [3, 1] if (cfg.output_mask and cfg.split_head) else \
            [4] if cfg.output_mask else [3]
        # Fuse the two heads' first conv into ONE 2x-channel conv over the
        # padded full-res tensor (its biggest HBM read — docs/PERF.md
        # headroom list): kernels/biases are concatenated at apply time, so
        # the parameter tree (out{j}_conv_in/{kernel,bias}) and therefore
        # every converter/checkpoint stays byte-identical. The UV channels'
        # contribution is input-independent and rides as a precomputed map
        # (`_uv_conv_response`), keeping the contraction at the aligned
        # feature width.
        if len(dim_out) == 2:
            cc = cfg.last_conv_channels
            ps = [_ConvParams(cc, c + 2, name=f"out{j}_conv_in")()
                  for j in range(2)]
            kern = jnp.concatenate([k for k, _ in ps], axis=-1).astype(cfg.dtype)
            bias = jnp.concatenate([bv for _, bv in ps], axis=0).astype(cfg.dtype)
            both = jax.lax.conv_general_dilated(
                xp.astype(cfg.dtype), kern[:, :, :c, :], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + _uv_conv_response(
                img_h, img_w, aspect, kern[:, :, c:, :], bias, cfg.dtype)
            if cfg.last_res_blocks == 0 and cfg.last_conv_size == 1:
                # Production epilogue (vitl: no res blocks, 1x1 out convs):
                # both heads' output convs as ONE block-diagonal f32
                # contraction — one full-res read instead of two HBM-bound
                # conv passes over the same tensor (out0/out1_conv_out were
                # 6.3 ms of a 111 ms batch on the round-4 device profile).
                po = [_ConvParams(d, cc, ksize=1, name=f"out{j}_conv_out")()
                      for j, d in enumerate(dim_out)]
                kb = jnp.zeros((2 * cc, sum(dim_out)), jnp.float32)
                kb = kb.at[:cc, : dim_out[0]].set(po[0][0].reshape(cc, dim_out[0]))
                kb = kb.at[cc:, dim_out[0]:].set(po[1][0].reshape(cc, dim_out[1]))
                bb = jnp.concatenate([po[0][1], po[1][1]])
                return nn.relu(both).astype(jnp.float32) @ kb + bb
            fused_in = (both[..., :cc], both[..., cc:])
        else:
            import numpy as np

            uv = jnp.asarray(
                np.pad(_view_plane_uv(img_h, img_w, aspect),
                       ((1, 1), (1, 1), (0, 0)), mode="edge"), xp.dtype)
            xq = jnp.concatenate(
                [xp, jnp.broadcast_to(uv[None], (b, *uv.shape))], axis=-1)
            fused_in = None
        outs = []
        for j, d in enumerate(dim_out):
            h = fused_in[j] if fused_in is not None else nn.Conv(
                cfg.last_conv_channels, (3, 3), padding="VALID",
                dtype=cfg.dtype, param_dtype=jnp.float32,
                name=f"out{j}_conv_in",
            )(xq)
            for r in range(cfg.last_res_blocks):
                h = ResidualConvBlock(
                    cfg.last_conv_channels, cfg.last_conv_channels, cfg.dtype,
                    name=f"out{j}_res{r}",
                )(h)
            k = cfg.last_conv_size
            if k > 1:
                h = jnp.pad(nn.relu(h), ((0, 0), (k // 2,) * 2, (k // 2,) * 2, (0, 0)), mode="edge")
            else:
                h = nn.relu(h)
            outs.append(nn.Conv(
                d, (k, k), padding="VALID", dtype=jnp.float32,
                param_dtype=jnp.float32, name=f"out{j}_conv_out",
            )(h))
        return jnp.concatenate(outs, axis=-1)


def _remap_points(raw: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Output-space remapping; parity: `moge_model.py:273-292`."""
    if mode == "linear":
        return raw
    if mode == "sinh":
        return jnp.sinh(raw)
    if mode == "exp":
        xy, z = raw[..., :2], raw[..., 2:]
        z = jnp.exp(z)
        return jnp.concatenate([xy * z, z], axis=-1)
    if mode == "sinh_exp":
        xy, z = raw[..., :2], raw[..., 2:]
        return jnp.concatenate([jnp.sinh(xy), jnp.exp(z)], axis=-1)
    raise ValueError(f"Invalid remap mode: {mode}")


class MoGeModel(nn.Module):
    """Forward pass: image -> affine point map (+ mask logit)."""

    cfg: MoGeConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> dict:
        cfg = self.cfg
        b, h, w, _ = images.shape
        enc = ViT(cfg.backbone, name="backbone")(images)
        if cfg.head_style not in ("tpu", "reference"):
            raise ValueError(f"Unknown head_style: {cfg.head_style!r} (expected 'tpu' or 'reference')")
        head_cls = MoGeCheckpointHead if cfg.head_style == "reference" else MoGeHead
        out = head_cls(cfg, name="head")(enc["hiddens"], enc["grid"], (h, w))
        points = _remap_points(out[..., :3].astype(jnp.float32), cfg.remap_output)
        result = {"points": points}
        if cfg.output_mask:
            result["mask"] = jax.nn.sigmoid(out[..., 3].astype(jnp.float32))
        return result


def moge_infer(
    model: MoGeModel,
    params,
    images: jnp.ndarray,
    apply_mask: bool = True,
    force_projection: bool = True,
    fov_x_degrees: jnp.ndarray | None = None,
) -> dict:
    """Batched MoGe inference: points, depth, normalized intrinsics, mask.

    Behavioral parity with `MoGeModel.infer` (`moge_model.py:298-393`):
    focal/shift recovery from the affine point map (optionally conditioned on
    a known horizontal FoV), normalized intrinsics with centered principal
    point, projection-consistent point map, inf-masking of invalid pixels.
    Fully jittable; vmap/pjit over the batch dim.
    """
    out = model.apply({"params": params}, images)
    points = out["points"]
    mask = out.get("mask")
    b, h, w, _ = points.shape
    aspect = w / h

    mask_bool = None if mask is None else mask > 0.5
    if fov_x_degrees is None:
        focal, shift = recover_focal_shift(points, mask_bool)
    else:
        fov = jnp.deg2rad(jnp.asarray(fov_x_degrees, jnp.float32))
        focal = aspect / (1 + aspect**2) ** 0.5 / jnp.tan(fov / 2)
        focal = jnp.broadcast_to(focal, (b,))
        _, shift = recover_focal_shift(points, mask_bool, focal=focal)

    intrinsics = intrinsics_from_diag_focal(focal, w, h)  # normalized, c=0.5
    depth = points[..., 2] + shift[:, None, None]

    if force_projection:
        # Re-project: points = depth * K^-1 [u+0.5, v+0.5, 1] in normalized
        # image coordinates (uv in [0,1], pixel centers) — parity with
        # utils3d.unproject_cv as used at moge_model.py:369.
        us = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        uu, vv = jnp.meshgrid(us, vs)
        fx = intrinsics[:, 0, 0][:, None, None]
        fy = intrinsics[:, 1, 1][:, None, None]
        x = (uu[None] - 0.5) / fx * depth
        y = (vv[None] - 0.5) / fy * depth
        points = jnp.stack([x, y, depth], axis=-1)
    else:
        points = points + jnp.stack(
            [jnp.zeros_like(shift), jnp.zeros_like(shift), shift], axis=-1
        )[:, None, None, :]

    result = {"points": points, "intrinsics": intrinsics, "depth": depth}
    if mask is not None:
        final_mask = (depth > 0) & (mask > 0.5)
        if apply_mask:
            result["points"] = jnp.where(final_mask[..., None], points, jnp.inf)
            result["depth"] = jnp.where(final_mask, depth, jnp.inf)
        result["mask"] = final_mask
    return result


def pixel_intrinsics_from_normalized(intrinsics: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Normalized (c=0.5) -> pixel intrinsics; parity `infer_moge.py:30`."""
    scale = jnp.asarray(
        [[width, 1.0, width], [1.0, height, height], [1.0, 1.0, 1.0]], jnp.float32
    )
    return intrinsics * scale
